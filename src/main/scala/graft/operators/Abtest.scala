package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED — Controlled-experiment Using Pre-Experiment Data (Deng,
  * Xu, Kohavi & Walker, WSDM 2013): the standard variance-reduction
  * trick for A/B metrics. Each unit's experiment-period metric Y is
  * adjusted by its pre-period metric X:
  *
  *   Y_adj = Y − θ·(X − E[X]),   θ = cov(X, Y) / var(X)
  *
  * X predates the treatment, so E[Y_adj] per arm is unbiased for
  * E[Y] while var(Y_adj) shrinks by the squared X–Y correlation —
  * the same experiment reaches significance with a fraction of the
  * traffic.
  *
  * Scale shape: θ and E[X] come from ONE aggregation over units
  * (five sums), carried as a one-row broadcast frame (the
  * scalar-subquery device — no driver collect); the adjustment is a
  * map-only projection; the per-arm summary is one more partial-agg
  * shuffle at arm grain. Nothing subject-grain ever hits a window.
  *
  * Portability: θ is computed from raw sums by the textbook formula
  * and ROUNDED TO 6 dp before the adjustment is applied, so both
  * engines adjust with the IDENTICAL θ (unrounded, the two engines'
  * different summation orders would each produce their own θ and
  * every downstream number would drift); per-arm outputs round at 4.
  * Variances use the explicit sum-of-squares formula, not the
  * engine's var_samp, so the replay is the same arithmetic.
  */
object Abtest {

  /** Per-unit CUPED adjustment: input one row per unit with pre-period
    * `xCol` and experiment `yCol`; output adds `y_cuped`. θ pooled
    * across arms (pre-period data is treatment-independent).
    */
  def cupedAdjust(units: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val stats = units.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(x * y).as("__sxy"))
    units.crossJoin(broadcast(stats))
      .withColumn("__theta",
        round((col("__sxy") - col("__sx") * col("__sy") / col("__n")) /
          (col("__sxx") - col("__sx") * col("__sx") / col("__n")), 6))
      .withColumn("y_cuped",
        y - col("__theta") * (x - col("__sx") / col("__n")))
      .drop("__n", "__sx", "__sy", "__sxx", "__sxy", "__theta")
  }

  /** Per-arm experiment readout, plain and CUPED side by side:
    * (arm, n, mean_y, mean_y_cuped, var_y, var_y_cuped) — the
    * var_y_cuped / var_y ratio is the traffic a matched-power
    * experiment saves. Variances are sample variances from explicit
    * sums; everything rounds at 4 dp.
    */
  def cupedSummary(units: DataFrame, armCol: String,
      xCol: String, yCol: String): DataFrame = {
    val adj = cupedAdjust(units, xCol, yCol)
    val y = col(yCol).cast("double")
    val a = col("y_cuped")
    adj.groupBy(col(armCol))
      .agg(count(lit(1)).as("n"),
        sum(y).as("__sy"), sum(y * y).as("__syy"),
        sum(a).as("__sa"), sum(a * a).as("__saa"))
      .withColumn("__nd", col("n").cast("double"))
      .select(col(armCol), col("n"),
        round(col("__sy") / col("__nd"), 4).as("mean_y"),
        round(col("__sa") / col("__nd"), 4).as("mean_y_cuped"),
        round((col("__syy") - col("__sy") * col("__sy") / col("__nd")) /
          (col("__nd") - 1), 4).as("var_y"),
        round((col("__saa") - col("__sa") * col("__sa") / col("__nd")) /
          (col("__nd") - 1), 4).as("var_y_cuped"))
  }
}
