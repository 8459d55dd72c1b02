package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed table layout — Spark's persisted co-location device: a
  * table written with `bucketBy(n, key)` hash-partitions its FILES by
  * the key at write time, and every later equi-join or aggregation on
  * that key reads the bucketing from the catalog and skips its
  * shuffle entirely (the scan IS the required `HashPartitioning`).
  * This is the 100 TB answer to "we join these two corpus-sized
  * tables on this key every day": pay the shuffle ONCE at layout
  * time, never per query — the complement of the runtime devices
  * (broadcast for small dims, AQE for skew) used everywhere else in
  * this repo.
  *
  * Contract notes: both sides must bucket on the join key with the
  * SAME bucket count (or a divisor — Spark 3+ coalesces compatible
  * counts); `sortBy` within buckets additionally removes the
  * SortMergeJoin's per-task sort. Bucketing metadata lives in the
  * session catalog; `path` makes the table EXTERNAL so the layout
  * survives the session and re-registers on the next one
  * (`createOrReplace` semantics below).
  *
  * BucketingSpec pins the plan law this buys: the bucketed-join
  * subtree contains ZERO shuffle exchanges (vs 2 for the plain
  * parquet join) and results are row-identical.
  */
object Bucketing {

  /** Write `df` as an external bucketed table at `path`: `nBuckets`
    * hash buckets on `keyCol`, bucket-sorted by the same key (so
    * downstream SortMergeJoins skip both the exchange AND the sort).
    * Replaces any prior registration of `table`.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keyCol: String, nBuckets: Int): Unit = {
    require(nBuckets >= 2, s"nBuckets $nBuckets must be >= 2")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // repartition on the key first so each bucket lands as ONE file —
    // Spark only trusts (and uses) the bucket-sort metadata when a
    // bucket is a single file; more files per bucket re-inserts the
    // merge-join sort the layout paid to remove
    df.repartition(nBuckets, col(keyCol))
      .write
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Equi-join two registered bucketed tables on `keyCol`, hinted to
    * the merge join the bucketing accelerates (a broadcast would hide
    * the co-location being demonstrated — and at the corpus sizes
    * this layout targets, neither side broadcasts anyway).
    */
  def bucketedEquiJoin(spark: SparkSession, tableA: String,
      tableB: String, keyCol: String): DataFrame =
    spark.table(tableA).hint("merge")
      .join(spark.table(tableB).hint("merge"), Seq(keyCol))
}
