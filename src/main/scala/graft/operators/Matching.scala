package graft.operators

import graft.functions.Grid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Matched-pairs causal estimation — the matching leg of the causal
  * family ([[Abtest.ipwAte]] weights, [[Multiplicity]] corrects,
  * this PAIRS): within exact strata, treated and control units rank
  * by a balance score and rank i pairs with rank i (nearest-rank
  * matching — the deterministic, replayable core of propensity
  * matching; Rosenbaum & Rubin 1983 motivate the score, coarsened
  * exact matching the strata). Unmatched tails drop, which is the
  * point: estimation restricted to the region of common support.
  *
  * Execution shape: two KEYED rank windows (strata × arm) + one
  * (strata, rank) equi-join — no cross products, no global windows,
  * strata process in parallel. The ATT readout sums EXACT scaled
  * longs over the pairs, so the estimate replays engine-identically
  * (the [[Seasonal]] scale contract).
  */
object Matching {

  /** Pair and estimate. Returns one row per stratum:
    * `(strata, n_treated, n_control, n_pairs, att)` — att = the mean
    * treated-minus-matched-control outcome difference over that
    * stratum's pairs (snapped), null where no pair exists.
    * `scale` declares `outcomeCol`'s decimal grid.
    */
  def rankMatchAtt(df: DataFrame, strataCol: String, treatCol: String,
      scoreCol: String, idCol: String, outcomeCol: String,
      scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val p = math.pow(10.0, scale)
    val w = Window.partitionBy(col("__s"), col("__tr"))
      .orderBy(col("__sc").desc, col("__id"))
    val ranked = df
      // a null OUTCOME must drop before pairing — paired in but null
      // in the diff-sum, it would deflate the ATT denominator-silently
      .filter(col(treatCol).isNotNull && col(scoreCol).isNotNull &&
        col(outcomeCol).isNotNull)
      .select(col(strataCol).as("__s"),
        col(treatCol).cast("boolean").as("__tr"),
        col(scoreCol).cast("double").as("__sc"),
        col(idCol).as("__id"),
        floor(col(outcomeCol).cast("double") * p + 0.5).cast("long")
          .as("__y"))
      .withColumn("__rk", row_number().over(w))
    val t = ranked.filter(col("__tr"))
      .select(col("__s"), col("__rk"), col("__y").as("__yt"))
    val c = ranked.filter(!col("__tr"))
      .select(col("__s"), col("__rk"), col("__y").as("__yc"))
    val counts = ranked.groupBy(col("__s"))
      .agg(sum(when(col("__tr"), 1L).otherwise(0L)).as("n_treated"),
        sum(when(col("__tr"), 0L).otherwise(1L)).as("n_control"))
    val pairs = t.join(c, Seq("__s", "__rk"))
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__yt") - col("__yc")).as("__d"))
    counts.join(pairs, Seq("__s"), "left")
      .select(col("__s").as(strataCol), col("n_treated"),
        col("n_control"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        Grid.snap(col("__d").cast("double") /
          (lit(p) * col("n_pairs"))).as("att"))
  }
}
