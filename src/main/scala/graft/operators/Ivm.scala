package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for distributive
  * aggregates — the warehouse operation that turns "recompute the
  * rollup nightly over everything" into "fold today's delta":
  * a view row is `(keys..., n, sum_v)`, a delta is the SAME shape
  * built from the new rows (or, for retractions, from the removed
  * rows with `negate = true` — counts and sums flip sign), and the
  * fold is a key-grain union + re-aggregation. Rows whose count
  * reaches zero vanish, so add-then-retract round-trips exactly.
  *
  * Money sums snap to the cent grid ([[graft.functions.Grid]] — the
  * engine-exact IEEE snap, not `round()`) at every build/merge,
  * keeping the view engine-exact regardless of fold order (the house
  * events device). Avg/min/max readers derive from (n, sum) or keep their
  * own mergeable columns; non-distributive aggregates (exact
  * distinct, median) need the sketch registers instead
  * ([[Sketches]], [[QuantileSketch]] — same fold contract).
  *
  * 100 TB shape: the view lives at key grain; a delta fold shuffles
  * only (delta keys ∪ view keys), never the fact table.
  */
object Ivm {

  /** Build a view (or delta) from fact rows. */
  def buildAggView(df: DataFrame, keyCols: Seq[String],
      valueCol: String, negate: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key")
    val sign = if (negate) lit(-1L) else lit(1L)
    val signD = if (negate) lit(-1.0) else lit(1.0)
    df.groupBy(keyCols.map(col): _*)
      .agg((count(lit(1)) * sign).as("n"),
        graft.functions.Grid.snap(
          sum(col(valueCol).cast("double")) * signD, 2)
          .as("sum_v"))
  }

  /** Fold any number of views/deltas (same schema) into one:
    * key-grain union + re-aggregation, zero-count rows dropped.
    */
  def mergeViews(keyCols: Seq[String], views: DataFrame*): DataFrame = {
    require(views.nonEmpty, "nothing to merge")
    views.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        graft.functions.Grid.snap(sum(col("sum_v")), 2).as("sum_v"))
      .filter(col("n") =!= 0L)
  }

  /** Persist / fold-on-disk / read — the q273 index-maintenance
    * contract for the view: overwrite on build, append a delta file,
    * and READ always re-merges at key grain so appended deltas are
    * invisible to readers.
    */
  def writeView(view: DataFrame, path: String): Unit =
    view.write.mode("overwrite").parquet(path)

  def appendDelta(delta: DataFrame, path: String): Unit =
    delta.write.mode("append").parquet(path)

  def readView(spark: SparkSession, path: String,
      keyCols: Seq[String]): DataFrame =
    mergeViews(keyCols, spark.read.parquet(path))
}
