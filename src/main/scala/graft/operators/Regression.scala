package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped ordinary-least-squares line fits — the per-entity trend
  * primitive (activity drift per user, length drift per source) as ONE
  * partial-aggregating pass: slope and intercept come from the five
  * classical sums (n, Σx, Σy, Σxy, Σx²), so a million groups fit in a
  * single shuffle at group grain and no group's rows ever colocate
  * beyond ordinary aggregation. The same normal-equations device
  * [[Keywords]] uses for its Zipf/Heaps fits, generalized to arbitrary
  * (group, x, y).
  */
object Regression {

  /** Per-group OLS fit of `y` on `x`: slope, intercept, n. Groups whose
    * denominator `n·Σx² − (Σx)²` is zero (n < 2, or a constant x)
    * return null slope/intercept — degenerate fits surface as nulls,
    * never as ±inf (the q110 zipfFit contract).
    */
  def groupedLinearFit(df: DataFrame, groupCol: String, x: Column,
      y: Column): DataFrame = {
    val agg = df
      .select(col(groupCol), x.cast("double").as("__rg_x"),
        y.cast("double").as("__rg_y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__rg_x")).as("sx"),
        sum(col("__rg_y")).as("sy"),
        sum(col("__rg_x") * col("__rg_y")).as("sxy"),
        sum(col("__rg_x") * col("__rg_x")).as("sxx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) / den
    agg
      .withColumn("slope", when(den =!= 0.0, slope))
      .withColumn("intercept",
        when(den =!= 0.0, (col("sy") - slope * col("sx")) / col("n")))
      .select(col(groupCol), col("n"), col("slope"), col("intercept"))
  }
}
