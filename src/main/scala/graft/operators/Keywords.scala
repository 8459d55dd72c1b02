package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistical term scoring: TF-IDF keyword extraction and
  * vocabulary-coverage (OOV) accounting — the analysis layer a training
  * pipeline uses to characterize sources, pick tokenizer vocabularies,
  * and audit what a fixed vocabulary fails to cover.
  *
  * 100 TB shape: term frequencies are one hash-shuffle on (doc, token)
  * with map-side combine; document frequencies one more on token. The
  * idf side joins back as a plain equi-join on `token` — its
  * cardinality is the DISTINCT-TOKEN count of the corpus, which for web
  * text is dominated by hapaxes and grows into the billions at 100 TB,
  * so the join must be ALLOWED to be a shuffle; AQE broadcasts it
  * whenever the actual size fits (as it does at test scale). The
  * per-doc top-k is a window over the doc key — partitioned by
  * document, so no global sort.
  */
object Keywords {

  /** Per-document top-`k` terms by TF-IDF.
    *
    * Scoring: `tf * ln(N / df)` with `N` the corpus document count,
    * rounded to 4 decimals BEFORE ranking — `ln` is libm-specific in its
    * last ulp, so ranking on the rounded grid (ties broken by token) is
    * what makes the result reproducible across engines (the same move as
    * the cosine scores elsewhere in this library).
    *
    * Returns (id, token, tf, df, tfidf, rank) with rank in [1, k].
    *
    * `tokensCol` joins the tokenize-once contract (see
    * [[CorpusPipeline.prepare]]): when the caller already materialized a
    * token-array column, pass its name and the whole-corpus regexp pass
    * is skipped — same parameter every other corpus operator takes.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int, tokensCol: Option[String] = None): DataFrame = {
    val toks = tokenRows(docs, idCol, textCol, tokensCol)
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("__N"))
    // NO broadcast hint on df: one row per distinct corpus token means
    // corpus-scale cardinality (hapax-dominated — hundreds of millions
    // to billions of rows at 100 TB). A forced hint bypasses AQE's size
    // check and builds the table on the driver; the plain equi-join
    // lets AQE broadcast exactly when the actual size fits. `total` is
    // one row — that broadcast is unconditional by construction: the
    // resulting BroadcastNestedLoopJoin over a ONE-ROW build side is the
    // scalar-subquery shape (each stream row probes a single cached row;
    // a constant-key equi-join folds back to exactly this, so there is
    // no BHJ spelling of it). PlanQualitySpec budgets q69 one such
    // single-row BNLJ and zero cartesians.
    val scored = tf
      .join(df, Seq("token"))
      .crossJoin(broadcast(total))
      .withColumn("tfidf",
        round(col("tf") * log(col("__N").cast("double") /
          col("df").cast("double")), 4))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("token"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** Vocabulary coverage: per-document token totals and how many fall
    * OUTSIDE `vocab` (a token DataFrame with column `token` — e.g. the
    * top-k output of a vocabulary query). Returns every `docs` row plus
    * `n_tokens`, `n_oov`, and `oov_per_1000` (integer grid: engines agree
    * without float division).
    *
    * The vocab side broadcasts — tokenizer vocabularies are ≤ a few
    * hundred thousand rows against a corpus of billions (this hint is
    * deliberate and BOUNDED, unlike a distinct-corpus-token table).
    * `tokensCol` joins the tokenize-once contract as above.
    */
  def oovAgainstVocab(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, tokensCol: Option[String] = None): DataFrame = {
    val toks = tokenRows(docs, idCol, textCol, tokensCol)
    val v = vocab.select(col("token")).distinct()
      .withColumn("__in_vocab", lit(1))
    val perDoc = toks
      .join(broadcast(v), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1).otherwise(0)).cast("long")
          .as("n_oov"))
      .withColumn("oov_per_1000",
        floor((col("n_oov") * lit(1000L)) / col("n_tokens")).cast("long"))
    docs.join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_tokens", "n_oov", "oov_per_1000"))
  }

  /** Per-document token-rarity mass: `n_tokens` plus `freq_mass` = the
    * sum over the document's tokens of each token's CORPUS frequency —
    * the log-free CCNet-style frequency prior on the integer grid (low
    * mass = rare/garbled text, high mass = boilerplate-common).
    *
    * The (id, token) explode feeds BOTH the frequency aggregation and
    * the join-back probe side, so it is persisted for the duration of
    * the call (ownership registered with the active [[graft.CacheScope]],
    * same contract as [[Novelty.gramNovelty]]) — one corpus tokenize
    * pass, not two. The frequency join stays un-hinted: one row per
    * distinct corpus token is corpus-scale cardinality (see the
    * [[tfIdfTopTerms]] df-join note). `tokensCol` joins the
    * tokenize-once contract.
    *
    * Dropped-row contract (like [[NgramLm.logProbScore]], unlike the
    * left-join-back siblings [[oovRate]]/[[Novelty.gramNovelty]]): a
    * ZERO-TOKEN document contributes no (id, token) rows and emits NO
    * output row — there is no frequency mass to report and no natural
    * zero (a 0 would alias "all-rare text"). Pipelines that must keep
    * empty docs left-join this result back to the corpus.
    */
  def tokenFrequencyMass(docs: DataFrame, idCol: String, textCol: String,
      tokensCol: Option[String] = None): DataFrame = {
    val tok = graft.CacheScope.register(
      tokenRows(docs, idCol, textCol, tokensCol).persist())
    val freq = tok.groupBy(col("token")).agg(count(lit(1)).as("tf"))
    tok.join(freq, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("tf")).cast("long").as("freq_mass"))
  }

  /** Zipf fit of the corpus token-frequency distribution: least-squares
    * slope and intercept of `ln(freq)` on `ln(rank)` over the ranked
    * vocabulary — the standard corpus-health diagnostic (natural text
    * fits slope ≈ −1; OCR garbage, boilerplate floods, and truncated
    * vocabularies bend the curve). Returns ONE row:
    * `(n_vocab, n_tokens, slope, intercept)`, slope/intercept on the
    * 1e-4 grid.
    *
    * 100 TB shape: frequencies are one partial-agg shuffle; the rank is
    * a DISTRIBUTED sort + zipWithIndex over the vocabulary table (the
    * [[TokenizerTraining.vocabulary]] device — a range partitioner
    * gives the total order; never a single-partition window over a
    * billion-hapax vocabulary); the fit itself is one aggregation of
    * the five regression sums. Ordering ties (equal frequencies) break
    * on token text, so the rank — and therefore the fit — is
    * deterministic and engine-replayable.
    */
  def zipfFit(docs: DataFrame, idCol: String, textCol: String,
      tokensCol: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val freq = tokenRows(docs, idCol, textCol, tokensCol)
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val ranked = freq
      .orderBy(col("freq").desc, col("token"))
      .as[(String, Long)].rdd.zipWithIndex()
      .map { case ((_, f), i) => (i + 1, f) }
      .toDF("rank", "freq")
    ranked
      .select(log(col("rank").cast("double")).as("x"),
        log(col("freq").cast("double")).as("y"),
        col("freq"))
      .agg(count(lit(1)).as("n_vocab"),
        sum(col("freq")).cast("long").as("n_tokens"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n_vocab"), col("n_tokens"),
        // < 2 distinct ranks (empty corpus or one-token vocabulary) has
        // no line to fit: null, never a NaN from the 0/0 (NaN ordering
        // and equality diverge across engines)
        when(col("n_vocab") < 2, lit(null).cast("double"))
          .otherwise(round(
            (col("n_vocab") * col("sxy") - col("sx") * col("sy")) /
              (col("n_vocab") * col("sxx") - col("sx") * col("sx")), 4))
          .as("slope"),
        when(col("n_vocab") < 2, lit(null).cast("double"))
          .otherwise(round((col("sy") - ((col("n_vocab") * col("sxy") -
              col("sx") * col("sy")) /
            (col("n_vocab") * col("sxx") - col("sx") * col("sx"))) *
              col("sx")) / col("n_vocab"), 4))
          .as("intercept"))
  }

  /** (id, token) rows — from the caller's pre-tokenized column when the
    * tokenize-once contract is in play, else one regexp pass here.
    */
  private def tokenRows(docs: DataFrame, idCol: String, textCol: String,
      tokensCol: Option[String]): DataFrame =
    docs
      .withColumn("__kw_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol), explode(col("__kw_toks")).as("token"))
}
