package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — "which intervals contain this point" —
  * without the O(points × intervals) nested loop Spark plans for a
  * bare inequality join: time is cut into fixed GRANULES, each
  * interval explodes into the granules it overlaps (span/width + 1
  * rows — bounded when interval lengths are), each point owns exactly
  * one granule, and the granule equi-join hands Catalyst a hash key;
  * the exact `start <= t < end` predicate then filters the granule-
  * local candidates. This is the bucketed range-join device production
  * engines special-case (Databricks' RANGE_JOIN hint does the same
  * binning); here it is plain DataFrame algebra.
  *
  * 100 TB shape: one shuffle per side on (granule [+ key]); candidate
  * volume is points × the intervals overlapping their granule — local
  * density, not global cardinality. `bucketMicros` trades explode
  * fan-out (long intervals → many granule rows) against candidate
  * precision (wide granules → more false candidates filtered by the
  * exact predicate); set it near the TYPICAL interval length so most
  * intervals emit ~2 granule rows.
  *
  * A point pairs each interval at most once (its single granule row
  * meets each interval's distinct granule rows on ONE granule), so no
  * dedup stage exists.
  */
object RangeJoin {

  /** Inner interval join: one row per (point, containing interval) —
    * `pointTime` in `[startCol, endCol)`, plus equality on the
    * optional `keyCols` (present in both frames). Column names of
    * `points` and `intervals` must not collide except `keyCols`.
    */
  def intervalJoin(points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketMicros: Long, keyCols: Seq[String] = Seq.empty): DataFrame = {
    require(bucketMicros > 0, s"bad bucketMicros $bucketMicros")
    val p = points.withColumn("__rj_b",
      floor(unix_micros(col(pointTime)) / bucketMicros))
    // granules floor(start/w) .. floor((end-1)/w); empty intervals
    // (end <= start) emit no granule rows and match nothing
    val iv = intervals
      .withColumn("__rj_s", unix_micros(col(startCol)))
      .withColumn("__rj_e", unix_micros(col(endCol)))
      .filter(col("__rj_e") > col("__rj_s"))
      .withColumn("__rj_b", explode(sequence(
        floor(col("__rj_s") / bucketMicros),
        floor((col("__rj_e") - 1) / bucketMicros))))
      .drop("__rj_s", "__rj_e")
    p.join(iv, Seq("__rj_b") ++ keyCols)
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) < col(endCol))
      .drop("__rj_b")
  }

  /** Interval × interval OVERLAP join: one row per (left, right) pair
    * with `[lStart, lEnd) ∩ [rStart, rEnd) ≠ ∅` (the half-open overlap
    * predicate `lS < rE AND rS < lE`), plus equality on the optional
    * `keyCols`. Both sides explode into granules like [[intervalJoin]];
    * a pair meeting at SEVERAL shared granules would duplicate, so each
    * pair is kept only at its RESPONSIBILITY granule — the granule
    * containing `max(lS, rS)`, the overlap's start, which both sides
    * provably cover — a pure filter, never a `distinct` over the
    * pair table (at 100 TB the dedup shuffle would dwarf the join).
    * Emits every pair exactly once with `overlap_micros`.
    */
  def overlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      bucketMicros: Long, keyCols: Seq[String] = Seq.empty): DataFrame = {
    require(bucketMicros > 0, s"bad bucketMicros $bucketMicros")
    def granulated(df: DataFrame, s: String, e: String, sOut: String,
        eOut: String): DataFrame = df
      .withColumn(sOut, unix_micros(col(s)))
      .withColumn(eOut, unix_micros(col(e)))
      .filter(col(eOut) > col(sOut))
      .withColumn("__rj_b", explode(sequence(
        floor(col(sOut) / bucketMicros),
        floor((col(eOut) - 1) / bucketMicros))))
    val l = granulated(left, lStart, lEnd, "__rj_ls", "__rj_le")
    val r = granulated(right, rStart, rEnd, "__rj_rs", "__rj_re")
    l.join(r, Seq("__rj_b") ++ keyCols)
      .filter(col("__rj_ls") < col("__rj_re") &&
        col("__rj_rs") < col("__rj_le"))
      .filter(col("__rj_b") ===
        floor(greatest(col("__rj_ls"), col("__rj_rs")) / bucketMicros))
      .withColumn("overlap_micros",
        least(col("__rj_le"), col("__rj_re")) -
          greatest(col("__rj_ls"), col("__rj_rs")))
      .drop("__rj_b", "__rj_ls", "__rj_le", "__rj_rs", "__rj_re")
  }

  /** Left-join counting form: every point row with `n_matches` = how
    * many intervals contain it (0 kept). The aggregation runs on the
    * inner join's output, then joins back by the point id — the count
    * table is at most points-cardinality.
    */
  def countingIntervalJoin(points: DataFrame, pointId: String,
      pointTime: String, intervals: DataFrame, startCol: String,
      endCol: String, bucketMicros: Long,
      keyCols: Seq[String] = Seq.empty): DataFrame = {
    val matched = intervalJoin(points, pointTime, intervals, startCol,
      endCol, bucketMicros, keyCols)
      .groupBy(col(pointId))
      .agg(count(lit(1)).as("n_matches"))
    points.join(matched, Seq(pointId), "left")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
  }
}
