package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Split-conformal prediction intervals (Vovk's inductive conformal;
  * Lei et al. 2018): the distribution-free way to attach a coverage
  * GUARANTEE to any point predictor — fit on a train split, take q̂ as
  * the ⌈(n_cal+1)(1−α)⌉-th smallest calibration |residual|, and
  * `prediction ± q̂` covers a fresh exchangeable point with probability
  * ≥ 1−α, whatever the data distribution.
  *
  * The splits are the repo's deterministic id-hash assignment
  * ([[Sampling.assignSplit]] — stable under re-partitioning and
  * appends, which is precisely the exchangeability hygiene conformal
  * needs), the predictor here is the per-group train mean (swap any
  * model's prediction column in unchanged), and every rank/window runs
  * keyed per group — nothing corpus-grain.
  */
object Conformal {

  /** Per-group split-conformal report:
    * `(group, n_train, n_cal, n_test, yhat, qhat, coverage)` — q̂ at
    * the exact conformal rank (clamped to the max calibration residual
    * when ⌈(n+1)(1−α)⌉ exceeds n_cal — the finite-sample corner where
    * the guarantee needs more calibration data; clamping is the
    * conservative-practice fallback, flagged by n_cal), and `coverage`
    * the held-out fraction inside `yhat ± qhat` (≥ 1−α in expectation).
    * Groups must appear in all three splits to be reportable (inner
    * joins — a group too small to split has no conformal story).
    */
  def splitConformalByGroup(df: DataFrame, idCol: String,
      groupCol: String, valueCol: String, alphaPct: Int = 10): DataFrame = {
    require(alphaPct >= 1 && alphaPct < 100, s"bad alphaPct $alphaPct")
    val sp = graft.CacheScope.register(
      Sampling.assignSplit(df.filter(col(valueCol).isNotNull), idCol,
        Seq("train" -> 5000, "cal" -> 2500, "test" -> 2500))
      .select(col(groupCol).as("__g"), col(idCol).as("__id"),
        col(valueCol).cast("double").as("__y"), col("split"))
      .persist())
    val fit = sp.filter(col("split") === "train")
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_train"),
        round(sum(col("__y")) / count(lit(1)), 4).as("yhat"))
    val calRes = sp.filter(col("split") === "cal")
      .join(fit, Seq("__g"))
      .withColumn("__r", round(abs(col("__y") - col("yhat")), 4))
    val wq = Window.partitionBy(col("__g")).orderBy(col("__r"), col("__id"))
    val qhat = calRes
      .withColumn("__rn", row_number().over(wq))
      .withColumn("n_cal",
        count(lit(1)).over(Window.partitionBy(col("__g"))))
      // conformal rank ⌈(n+1)(1−α)/1⌉ on the percent grid, clamped to n
      .filter(col("__rn") === least(col("n_cal"),
        expr(s"CAST(((n_cal + 1) * ${100 - alphaPct} + 99) DIV 100 " +
          "AS BIGINT)")))
      .select(col("__g"), col("n_cal"), col("__r").as("qhat"))
    sp.filter(col("split") === "test")
      .join(fit, Seq("__g")).join(qhat, Seq("__g"))
      .groupBy(col("__g"), col("n_train"), col("n_cal"), col("yhat"),
        col("qhat"))
      .agg(count(lit(1)).as("n_test"),
        round(sum(when(abs(col("__y") - col("yhat")) <= col("qhat"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)), 4)
          .as("coverage"))
      .select(col("__g").as(groupCol), col("n_train"), col("n_cal"),
        col("n_test"), col("yhat"), col("qhat"), col("coverage"))
  }
}
