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

  /** A trained logistic model over hashed n-gram features: `weights(b)`
    * for buckets `0 until numBuckets` (dense — unseen buckets are 0.0)
    * plus the bias. The whole model is `numBuckets + 1` doubles — a
    * bounded driver fact by CONFIG, the same contract as k-means
    * centroids.
    */
  final case class LogisticModel(weights: Array[Double], bias: Double,
      numBuckets: Int)

  /** Batch-gradient-descent logistic regression over [[Dsir]]'s hashed
    * unigram+bigram features — the fastText/GPT-3-shaped LINEAR quality
    * classifier proper (the iterative counterpart to the closed-form
    * [[train]]).
    *
    * Features are per-doc bucket frequencies `x_b = c_b / n_feats`
    * (exact one-divide doubles). Each epoch is two corpus passes:
    * margins `z_d = bias + Σ w_b·x_db` via a BROADCAST join against the
    * (config-bounded) weight table, then the gradient
    * `g_b = Σ_d (σ(z_d) − y_d)·x_db / N` via one bucket-grain
    * aggregation whose result — at most `numBuckets` rows — is the only
    * per-epoch driver collect. Full-batch (not stochastic) descent is
    * deliberate: the update is a pure dataset aggregate, so a second
    * engine replays the whole trajectory.
    */
  def trainLogistic(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, numBuckets: Int = 64, epochs: Int = 2,
      lr: Double = 2.0, tokensCol: Option[String] = None): LogisticModel = {
    require(numBuckets > 0 && epochs >= 1 && lr > 0,
      s"bad hyperparameters: buckets=$numBuckets epochs=$epochs lr=$lr")
    val spark = labeled.sparkSession
    import spark.implicits._
    val feats = graft.CacheScope.register(
      Dsir.hashedFeatureRows(labeled, idCol, textCol, numBuckets,
          tokensCol)
        .groupBy(col(idCol), col("bucket"))
        .agg(count(lit(1)).as("__lg_c"))
        .withColumn("__lg_nf",
          sum(col("__lg_c")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col(idCol))))
        .withColumn("x", col("__lg_c").cast("double") / col("__lg_nf"))
        .select(col(idCol), col("bucket"), col("x"))
        .persist())
    val docs = graft.CacheScope.register(labeled
      .select(col(idCol),
        when(col(labelCol), 1.0).otherwise(0.0).as("y"))
      .persist())
    val n = docs.count()
    require(n > 0, "empty training frame")
    var w = Array.fill(numBuckets)(0.0)
    var bias = 0.0
    for (_ <- 0 until epochs) {
      val wDf = w.toIndexedSeq.zipWithIndex
        .map { case (v, b) => (b.toLong, v) }.toDF("bucket", "w")
      val margins = feats.join(broadcast(wDf), Seq("bucket"))
        .groupBy(col(idCol))
        .agg(sum(col("x") * col("w")).as("__lg_dot"))
      val err = docs.join(margins, Seq(idCol), "left")
        .withColumn("__lg_z", lit(bias) +
          coalesce(col("__lg_dot"), lit(0.0)))
        .withColumn("__lg_err",
          lit(1.0) / (lit(1.0) + exp(-col("__lg_z"))) - col("y"))
        .select(col(idCol), col("__lg_err"))
      // bucket-grain gradient: <= numBuckets rows, the bounded collect
      val gw = feats.join(err, Seq(idCol))
        .groupBy(col("bucket"))
        .agg((sum(col("x") * col("__lg_err")) / n).as("g"))
        .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
      val gb = err.agg(sum(col("__lg_err")) / n).head().getDouble(0)
      w = Array.tabulate(numBuckets)(b => w(b) - lr * gw.getOrElse(b, 0.0))
      bias -= lr * gb
    }
    LogisticModel(w, bias, numBuckets)
  }

  /** All columns of `docs` plus (n_feats, score, predicted) under a
    * trained [[LogisticModel]]: `score` is the sigmoid probability,
    * `predicted` the 0.5 threshold (margin > 0). Unseen buckets weigh
    * 0; a doc with no features scores the bare bias.
    */
  def scoreLogistic(docs: DataFrame, idCol: String, textCol: String,
      model: LogisticModel, tokensCol: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wDf = model.weights.toIndexedSeq.zipWithIndex
      .map { case (v, b) => (b.toLong, v) }.toDF("bucket", "w")
    val perDoc = Dsir.hashedFeatureRows(docs, idCol, textCol,
        model.numBuckets, tokensCol)
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("__lg_c"))
      .withColumn("__lg_nf",
        sum(col("__lg_c")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol))))
      .join(broadcast(wDf), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(any_value(col("__lg_nf")).as("n_feats"),
        sum(col("__lg_c").cast("double") / col("__lg_nf") * col("w"))
          .as("__lg_dot"))
    docs.join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_feats"))
      .withColumn("__lg_z",
        lit(model.bias) + coalesce(col("__lg_dot"), lit(0.0)))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-col("__lg_z"))))
      .withColumn("predicted", col("__lg_z") > 0)
      .drop("__lg_dot", "__lg_z")
  }

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

  /** K-fold cross-validation of the Naive-Bayes classifier WITHOUT
    * training k times: NB's sufficient statistics are counts, so fold
    * f's leave-fold-out model is the GLOBAL count table minus fold
    * f's counts — one corpus tokenize pass builds per-(token, fold)
    * counts, a complement join materializes all k models at once
    * (token × k rows), and every document scores against its own
    * fold's complement via one (token, fold) equi-join. The k-pass
    * retrain a naive CV runs becomes two passes total.
    *
    * Per-fold smoothing uses that fold's complement vocabulary (a
    * token seen ONLY in fold f is out-of-vocabulary for fold f's
    * model — exactly what a real held-out split would see). All
    * log-ratios round at 1e-6 so both engines sum identical grid
    * values. Output: one row per fold — sizes, accuracy, mean score.
    */
  def crossValidateNb(labeled: DataFrame, idCol: String,
      textCol: String, labelCol: String, kFolds: Int = 5,
      alpha: Double = 1.0): DataFrame = {
    require(kFolds >= 2 && kFolds <= 64, s"bad kFolds $kFolds")
    require(alpha > 0, s"alpha $alpha must be positive")
    val spark = labeled.sparkSession
    import spark.implicits._
    val withFold = graft.CacheScope.register(labeled
      .withColumn("__cv_fold", pmod(graft.expressions.HashExpressions
        .splitmix64(col(idCol).cast("long")), lit(kFolds.toLong))
        .cast("int"))
      .persist())
    val tokCnt = graft.CacheScope.register(withFold
      .select(col("__cv_fold"), col(labelCol).as("__y"),
        explode(TF.tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("__cv_fold"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("cn"))
      .persist())
    val tokTot = tokCnt.groupBy(col("token"))
      .agg(sum(col("cp")).as("tpt"), sum(col("cn")).as("tnt"))
    val folds = (0 until kFolds).toDF("__cv_fold")
    val comp = tokTot.crossJoin(broadcast(folds))
      .join(tokCnt, Seq("token", "__cv_fold"), "left")
      .na.fill(0L, Seq("cp", "cn"))
      .select(col("token"), col("__cv_fold"),
        (col("tpt") - col("cp")).as("ccp"),
        (col("tnt") - col("cn")).as("ccn"))
      .filter(col("ccp") + col("ccn") > 0)
    // k-row model metadata: complement vocab, occurrence totals,
    // doc-count priors (complement = grand total − fold)
    val occ = comp.groupBy(col("__cv_fold"))
      .agg(count(lit(1)).as("v"), sum(col("ccp")).as("tp"),
        sum(col("ccn")).as("tn"))
    val docTot = withFold.groupBy(col("__cv_fold"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("np_f"),
        sum(when(!col(labelCol), 1L).otherwise(0L)).as("nn_f"))
    val grand = withFold.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("np"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("nn"))
    val a = lit(alpha)
    val meta = occ.join(docTot, Seq("__cv_fold"))
      .crossJoin(broadcast(grand))
      .select(col("__cv_fold"), col("v"), col("tp"), col("tn"),
        round(log(a / (col("tp") + a * col("v"))) -
          log(a / (col("tn") + a * col("v"))), 6).as("oov"),
        round(log((col("np") - col("np_f")).cast("double") /
          (col("nn") - col("nn_f")).cast("double")), 6).as("prior"))
    val llr = comp.join(broadcast(meta), Seq("__cv_fold"))
      .select(col("token"), col("__cv_fold"),
        round(log((col("ccp") + a) / (col("tp") + a * col("v"))) -
          log((col("ccn") + a) / (col("tn") + a * col("v"))), 6)
          .as("llr"))
    val perDoc = withFold
      .select(col(idCol), col("__cv_fold"), col(labelCol).as("__y"),
        explode(TF.tokens(col(textCol))).as("token"))
      .join(llr, Seq("token", "__cv_fold"), "left")
      .join(broadcast(meta.select(col("__cv_fold"), col("oov"))),
        Seq("__cv_fold"))
      .groupBy(col(idCol), col("__cv_fold"), col("__y"))
      .agg(sum(coalesce(col("llr"), col("oov"))).as("__s"))
    withFold.select(col(idCol), col("__cv_fold"), col(labelCol)
        .as("__y"))
      .join(perDoc.select(col(idCol), col("__s")), Seq(idCol), "left")
      .join(broadcast(meta.select(col("__cv_fold"), col("prior"))),
        Seq("__cv_fold"))
      .withColumn("__score", col("prior") + coalesce(col("__s"),
        lit(0.0)))
      .withColumn("__pred", col("__score") > 0)
      .groupBy(col("__cv_fold").as("fold"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__pred") === col("__y"), 1L).otherwise(0L))
          .as("n_correct"),
        round(sum(when(col("__pred") === col("__y"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)), 4)
          .as("accuracy"),
        round(avg(col("__score")), 4).as("mean_score"))
      .orderBy(col("fold"))
  }

  /** Isotonic (pool-adjacent-violators) calibration over score bins —
    * the nonparametric companion to the reliability diagram: the
    * monotone step function closest (weighted L2) to the per-bin
    * positive rates. Computed by the MINIMAX closed form rather than
    * the sequential stack merge:
    *
    *   iso(i) = max_{j ≤ i} min_{k ≥ i} (Σ_{j..k} pos) / (Σ_{j..k} n)
    *
    * which is pure relational algebra — a cumsum self-join builds the
    * interval-average table, two grouped extrema take the minimax —
    * so the fit replays exactly in any engine (the sequential PAV
    * stack cannot be expressed as a fold with bounded state in SQL).
    *
    * Scale shape: the ONLY corpus-grain work is the binning
    * aggregation; everything after runs on the ≤ bins-row bin table
    * (intervals = bins², minimax triples = bins³ — thousands of rows
    * at bins = 16, a driver-trivial frame kept distributed anyway).
    * `probCol` must already be a probability in [0, 1].
    */
  def isotonicCalibrate(scored: DataFrame, probCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0 && bins <= 64, s"bins $bins out of (0, 64]")
    val binned = scored
      .withColumn("bin", least(floor(col(probCol) * bins),
        lit(bins - 1L)).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_pos"))
    // bounded bin-table scans and joins from here on: cumulative
    // weights/successes via the ordered prefix scan (exact integer
    // sums, no unpartitioned window)
    val cum = Ranks.withOrderedPrefixScan(binned, Seq(col("bin")),
      Seq("n" -> "cw", "n_pos" -> "cs"))
    val j = cum.select(col("bin").as("j"),
      (col("cw") - col("n")).as("cw0"), (col("cs") - col("n_pos"))
        .as("cs0"))
    val k = cum.select(col("bin").as("k"), col("cw").as("cwk"),
      col("cs").as("csk"))
    val intervals = j.join(k, col("j") <= col("k"))
      .withColumn("iavg", round((col("csk") - col("cs0")).cast("double")
        / (col("cwk") - col("cw0")).cast("double"), 6))
    val innerMin = binned.select(col("bin").as("i"), col("n"),
        col("n_pos"))
      .join(intervals, col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("n"), col("n_pos"), col("j"))
      .agg(min(col("iavg")).as("__mn"))
    innerMin.groupBy(col("i").as("bin"), col("n"), col("n_pos"))
      .agg(round(max(col("__mn")), 6).as("iso_rate"))
      .withColumn("raw_rate", round(col("n_pos").cast("double") /
        col("n").cast("double"), 6))
      .select(col("bin"), col("n"), col("n_pos"), col("raw_rate"),
        col("iso_rate"))
      .orderBy(col("bin"))
  }
}
