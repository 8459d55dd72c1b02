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
