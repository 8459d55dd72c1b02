package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) intervalization: collapse a keyed
  * observation stream into effective-dated state intervals — the
  * "snapshot stream → dimension history" build every warehouse runs.
  *
  * Given per-key observations of a state column ordered by (ts, seq),
  * consecutive runs of the SAME state collapse into one interval row
  * `[effective_from, effective_to)` where `effective_to` is the start
  * of the NEXT run (null for the key's current state). The run
  * detection is the standard gaps-and-islands device: a `lag` marks
  * change points, a running sum numbers the runs, one groupBy collapses
  * them — all three windows share ONE partitioning (the key), so the
  * whole build is a single shuffle on the dimension key followed by
  * partial aggregation. At 100 TB grain the key count bounds the
  * window state, never the observation count per partition batch.
  */
object Scd {

  /** Build SCD2 intervals. `seqCol` breaks timestamp ties
    * deterministically (any unique-per-key column).
    *
    * Output: key, state, effective_from, effective_to (null = current),
    * n_obs (observations collapsed into the interval), is_current.
    */
  def intervalize(df: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, seqCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(seqCol))
    val runs = df
      .withColumn("__scd_chg",
        when(lag(col(stateCol), 1).over(byKey).isNull ||
          lag(col(stateCol), 1).over(byKey) =!= col(stateCol), 1L)
          .otherwise(0L))
      .withColumn("__scd_run", sum(col("__scd_chg")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val intervals = runs
      .groupBy(col(keyCol), col("__scd_run"))
      .agg(any_value(col(stateCol)).as(stateCol), // constant within a run
        min(col(tsCol)).as("effective_from"),
        count(lit(1)).as("n_obs"))
    val byRun = Window.partitionBy(col(keyCol)).orderBy(col("__scd_run"))
    intervals
      .withColumn("effective_to",
        lead(col("effective_from"), 1).over(byRun))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__scd_run")
      .select(col(keyCol), col(stateCol), col("effective_from"),
        col("effective_to"), col("n_obs"), col("is_current"))
  }
}
