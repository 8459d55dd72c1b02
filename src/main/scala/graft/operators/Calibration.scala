package graft.operators

import graft.functions.Grid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Forecast-calibration audit — Murphy's (1973) decomposition of the
  * Brier score: for a forecaster that issues one probability per
  * GROUP (a rate model, a binned classifier, a per-segment prior),
  *
  *   Brier = reliability − resolution + uncertainty
  *
  * reliability = how far issued probabilities sit from the observed
  * rates they claimed (0 is perfectly calibrated), resolution = how
  * much the groups separate the base rate (bigger is better),
  * uncertainty = the base rate's own variance (the data's floor).
  * The QA readout for any probability the selection pipeline trusts.
  *
  * Execution shape: ONE aggregation collapses the test corpus to the
  * bounded group table (counts + positives, exact longs); the three
  * components then SUM OVER GROUPS — a float sum whose order the
  * engines would pick differently, so it runs on the bounded-table
  * ordered fold (sort by group key, aggregate HOF): by-construction
  * replay, the [[Preference]] denominator discipline. Divisions snap
  * at the readout.
  */
object Calibration {

  /** `test` rows carry `groupCol` and a boolean `outcomeCol`; `preds`
    * carries one row per group with `predCol` ∈ [0, 1] (grid values —
    * snap upstream). Groups in `test` missing from `preds` FAIL the
    * audit loudly (an unscored segment is a pipeline bug, not a row
    * to drop). Returns one row: `(n_items, n_groups, brier,
    * reliability, resolution, uncertainty)`.
    */
  def murphyDecomposition(test: DataFrame, groupCol: String,
      outcomeCol: String, preds: DataFrame,
      predCol: String): DataFrame = {
    val g = test
      .filter(col(outcomeCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(outcomeCol), 1L).otherwise(0L)).as("__o"))
    val p = preds.select(col(groupCol).as("__g"),
      col(predCol).cast("double").as("__p"))
    val joined = g.join(p, Seq("__g"), "left")
      .withColumn("__p", when(col("__p").isNotNull, col("__p"))
        .otherwise(raise_error(concat(lit("unscored group in Brier " +
          "audit: "), col("__g").cast("string")))))
    val tot = joined.agg(sum(col("__n")).as("__nn"),
      sum(col("__o")).as("__oo"))
    val terms = joined.crossJoin(broadcast(tot))
      .withColumn("__obar", col("__oo").cast("double") / col("__nn"))
      .withColumn("__rate", col("__o").cast("double") / col("__n"))
      .select(col("__g"), col("__nn"), col("__oo"), col("__obar"),
        struct(
          (col("__n") * (col("__p") - col("__rate")) *
            (col("__p") - col("__rate"))).as("rel"),
          (col("__n") * (col("__rate") - col("__obar")) *
            (col("__rate") - col("__obar"))).as("res"),
          (col("__n") * col("__p") * col("__p") -
            lit(2.0) * col("__p") * col("__o") + col("__o"))
            .as("br")).as("__t"))
    terms
      .groupBy(col("__nn"), col("__oo"), col("__obar"))
      .agg(count(lit(1)).as("n_groups"),
        expr("aggregate(sort_array(collect_list(struct(__g, __t))), " +
          "named_struct('rel', CAST(0.0 AS DOUBLE), " +
          "'res', CAST(0.0 AS DOUBLE), 'br', CAST(0.0 AS DOUBLE)), " +
          "(a, x) -> named_struct('rel', a.rel + x.__t.rel, " +
          "'res', a.res + x.__t.res, 'br', a.br + x.__t.br))")
          .as("__sum"))
      .select(col("__nn").as("n_items"), col("n_groups"),
        Grid.snap(col("__sum.br") / col("__nn")).as("brier"),
        Grid.snap(col("__sum.rel") / col("__nn")).as("reliability"),
        Grid.snap(col("__sum.res") / col("__nn")).as("resolution"),
        Grid.snap(col("__obar") * (lit(1.0) - col("__obar")))
          .as("uncertainty"))
  }
}
