package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering — the GPT-3/PaLM-style recipe:
  * train a lightweight text classifier to distinguish a TRUSTED corpus
  * (positive class) from the raw pool (negative), then score every raw
  * document and keep the target-like ones. The published deployments
  * use a linear fastText/logistic model; this is the multinomial
  * Naive Bayes form of the same bag-of-words decision rule — a
  * CLOSED-FORM train (two count aggregations, no iterative descent), so
  * both training and scoring are plain DataFrame algebra and a second
  * engine replays the exact scores.
  *
  * Decision rule: `score(doc) = ln(P(+)/P(−)) + Σ_tokens llr(w)` with
  * `llr(w) = ln((c₊(w)+α)/(T₊+αV)) − ln((c₋(w)+α)/(T₋+αV))`; unseen
  * tokens take the smoothing floor (`c = 0`). `predicted` = score > 0.
  *
  * 100 TB shape: training is ONE explode + count-table shuffle over the
  * labeled split (the per-token (c₊, c₋) table stays distributed —
  * corpus-derived, so the scoring join is UN-hinted, the [[Keywords]]
  * df-join rule); driver facts are five scalars (V, T₊, T₋, doc
  * priors). Scoring is one explode + one equi-join + one doc-grain
  * aggregation.
  */
object QualityClassifier {

  /** A trained model: the per-token llr table (token, llr), the
    * smoothing floor llr for unseen tokens, and the prior log-odds.
    */
  final case class NbModel(llr: DataFrame, oovLlr: Double,
      priorLlr: Double, vocab: Long)

  /** Train on `labeled`, whose boolean `labelCol` marks the positive
    * (trusted) class. Both classes must be present.
    */
  def train(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, alpha: Double = 1.0,
      tokensCol: Option[String] = None): NbModel = {
    require(alpha > 0, s"alpha $alpha must be positive (it is the floor)")
    val cnt = graft.CacheScope.register(labeled
      .withColumn("__qc_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(labelCol).as("__qc_pos"),
        explode(col("__qc_toks")).as("token"))
      .groupBy(col("token"))
      .agg(sum(when(col("__qc_pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__qc_pos"), 1L).otherwise(0L)).as("c_neg"))
      .persist())
    // five bounded driver facts: vocab size, the two occurrence totals
    // (aggregates of the count table), and the two doc-count priors
    val tot = cnt.agg(count(lit(1)).as("v"),
      coalesce(sum(col("c_pos")), lit(0L)).as("tp"),
      coalesce(sum(col("c_neg")), lit(0L)).as("tn")).head()
    val (v, tp, tn) = (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    val docs = labeled.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("np"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("nn")).head()
    val (np, nn) = (docs.getLong(0), docs.getLong(1))
    require(np > 0 && nn > 0,
      s"both classes must appear in the training split (pos=$np neg=$nn)")
    def lp(c: Column, t: Long): Column =
      log((c + lit(alpha)) / lit(t + alpha * v))
    val llr = cnt.select(col("token"),
      (lp(col("c_pos"), tp) - lp(col("c_neg"), tn)).as("llr"))
    val oov = math.log(alpha / (tp + alpha * v)) -
      math.log(alpha / (tn + alpha * v))
    NbModel(llr, oov, math.log(np.toDouble / nn), v)
  }

  /** All columns of `docs` plus (n_tokens, score, predicted). A doc
    * with no tokens scores the bare prior. `score` is the raw double —
    * callers round at the query edge.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel, tokensCol: Option[String] = None): DataFrame = {
    val perDoc = docs
      .withColumn("__qc_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol), explode(col("__qc_toks")).as("token"))
      .join(model.llr, Seq("token"), "left") // un-hinted: object doc
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("llr"), lit(model.oovLlr))).as("__qc_sum"))
    docs.join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens"))
      .withColumn("score",
        lit(model.priorLlr) + coalesce(col("__qc_sum"), lit(0.0)))
      .withColumn("predicted", col("score") > 0)
      .drop("__qc_sum")
  }

  /** The filter form: raw docs the classifier accepts (score > 0). */
  def keepAccepted(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel, tokensCol: Option[String] = None): DataFrame =
    docs.join(
      score(docs, idCol, textCol, model, tokensCol)
        .filter(col("predicted")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Reliability-diagram bins for a scored frame: the log-odds
    * `scoreCol` maps through the sigmoid to a probability, which lands
    * in one of `bins` equal-width bins (the top edge folds into the
    * last bin). Per bin: row count, mean predicted probability,
    * observed positive fraction, and the |gap| between them — the
    * per-bin terms of expected calibration error
    * (`ECE = Σ n_b/N · gap_b`, left to the caller so the bin rows stay
    * the unit of replay). ONE partial-aggregating shuffle at bin
    * cardinality — calibration of a trillion-row scored frame is free
    * next to the scoring itself.
    */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins $bins must be positive")
    val p = lit(1.0) / (lit(1.0) + exp(-col(scoreCol)))
    scored
      .withColumn("__qc_p", p)
      .withColumn("bin", least(floor(col("__qc_p") * bins),
        lit(bins - 1L)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("__qc_p")), 4).as("avg_pred"),
        round(avg(when(col(labelCol), 1.0).otherwise(0.0)), 4)
          .as("frac_pos"),
        round(abs(avg(col("__qc_p")) -
          avg(when(col(labelCol), 1.0).otherwise(0.0))), 4).as("gap"))
  }
}
