package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Heaps'-law fit of vocabulary growth: least-squares `ln(V)` on
    * `ln(N)` over prefix checkpoints of the corpus in id order — the
    * companion diagnostic to [[zipfFit]] (natural text grows
    * V ≈ K·N^β with β ≈ 0.4–0.6; a flat curve means a closed/truncated
    * vocabulary, a near-linear one means id-correlated novelty floods —
    * e.g. unscrubbed serial numbers). Returns ONE row:
    * `(n_points, n_tokens, n_vocab, beta, ln_k)`, beta/ln_k on the
    * 1e-4 grid (`beta` the slope, `ln_k` the intercept; null below 2
    * checkpoints, the [[zipfFit]] degenerate rule).
    *
    * Checkpoints are the halving prefixes `doc_id < (maxId+1) >> j` —
    * log-spaced sample sizes in pure INTEGER arithmetic, so an oracle
    * replays boundary placement exactly (a float `exp`-grid could
    * round a boundary across an integer and shift a whole checkpoint).
    *
    * 100 TB shape: a naive "vocabulary of every prefix" is quadratic;
    * this is two linear passes. Each token's FIRST document
    * (min id — one partial-agg shuffle) fully determines every
    * checkpoint's vocabulary: V_j counts tokens first seen before
    * boundary j, N_j sums doc token counts below it. Docs and tokens
    * assign to their smallest enclosing boundary (a literal-array
    * lookup — the boundary set is ~log2(corpus) entries), the per-
    * boundary partials cumulate over that ~40-row table (the bounded
    * window is config-sized, not corpus-sized), and the fit is one
    * aggregation of the regression sums. The only driver fact is
    * maxId (one long).
    */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
      tokensCol: Option[String] = None): DataFrame = {
    val toks = graft.CacheScope.register(docs
      .withColumn("__kw_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol).cast("long").as("__kw_id"), col("__kw_toks"))
      .persist())
    val maxId = toks.agg(max(col("__kw_id"))).head() match {
      case r if r.isNullAt(0) => -1L // empty corpus
      case r => r.getLong(0)
    }
    require(maxId >= -1 && maxId < Long.MaxValue, s"bad maxId $maxId")
    // halving boundaries M, M/2, M/4, ... 1 (descending), M = maxId+1;
    // prefix j = docs with id < boundary_j
    val bounds = Iterator.iterate(maxId + 1)(_ >> 1)
      .takeWhile(_ >= 1).toSeq
    if (bounds.length < 2) {
      // 0 or 1 checkpoints: no line to fit — null slope/intercept, the
      // zipfFit degenerate rule (never a NaN)
      return toks.sparkSession.range(1).select(
        lit(bounds.length).as("n_points"),
        lit(0L).as("n_tokens"), lit(0L).as("n_vocab"),
        lit(null).cast("double").as("beta"),
        lit(null).cast("double").as("ln_k"))
    }
    val bLit = array(bounds.map(lit(_)): _*)
    // smallest boundary > id = LAST survivor of the descending filter
    def boundOf(id: Column) =
      element_at(filter(bLit, b => b > id), -1)
    val perB = toks
      .select(boundOf(col("__kw_id")).as("b"),
        size(col("__kw_toks")).cast("long").as("n_tok"))
      .groupBy(col("b")).agg(sum(col("n_tok")).as("t"))
    val vocabB = toks
      .select(col("__kw_id"), explode(col("__kw_toks")).as("w"))
      .groupBy(col("w")).agg(min(col("__kw_id")).as("fd"))
      .select(boundOf(col("fd")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("v"))
    // ~log2(corpus) rows: cumulate over the boundary table with the
    // ordered prefix scan (exact integer sums, no global window)
    val pts = Ranks.withOrderedPrefixScan(
        perB.join(vocabB, Seq("b"), "full")
          .na.fill(0L, Seq("t", "v")),
        Seq(col("b")), Seq("t" -> "n_cum", "v" -> "v_cum"))
      .filter(col("n_cum") > 0 && col("v_cum") > 0)
      .select(log(col("n_cum").cast("double")).as("x"),
        log(col("v_cum").cast("double")).as("y"),
        col("n_cum"), col("v_cum"))
    pts.agg(count(lit(1)).as("n_points"),
        max(col("n_cum")).as("n_tokens"), max(col("v_cum")).as("n_vocab"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n_points"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_vocab"), lit(0L)).as("n_vocab"),
        when(col("n_points") < 2, lit(null).cast("double"))
          .otherwise(round(
            (col("n_points") * col("sxy") - col("sx") * col("sy")) /
              (col("n_points") * col("sxx") - col("sx") * col("sx")), 4))
          .as("beta"),
        when(col("n_points") < 2, lit(null).cast("double"))
          .otherwise(round((col("sy") - ((col("n_points") * col("sxy") -
              col("sx") * col("sy")) /
            (col("n_points") * col("sxx") - col("sx") * col("sx"))) *
              col("sx")) / col("n_points"), 4))
          .as("ln_k"))
  }

  /** Top-`k` collocations by pointwise mutual information:
    * `pmi(a b) = ln(c(ab)·T / (c(a)·c(b)))` over adjacent-token bigrams
    * (T = total bigram occurrences), restricted to bigrams occurring at
    * least `minCount` times (PMI is notoriously noisy on hapax pairs —
    * the standard floor). Returns (bigram, c_ab, c_a, c_b, pmi),
    * ranked on the ROUNDED 1e-4 grid with bigram-text tie-breaks (the
    * [[tfIdfTopTerms]] device — libm `ln` differs in the last ulp
    * across engines, ranking rounded scores is what replays).
    *
    * 100 TB shape: one bigram-count shuffle + one unigram-count shuffle
    * (both partial-agg), two UN-hinted equi-joins of the bigram table
    * against the unigram table (corpus-vocabulary cardinality — the
    * [[tfIdfTopTerms]] rule; AQE broadcasts when the runtime size
    * fits), the one-row total as the scalar-subquery broadcast, and a
    * global top-k that plans as `TakeOrdered` — never a corpus sort.
    */
  def pmiTopBigrams(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 5,
      tokensCol: Option[String] = None): DataFrame = {
    require(k >= 1, s"bad k $k")
    require(minCount >= 1, s"bad minCount $minCount")
    val toks = graft.CacheScope.register(docs
      .withColumn("__kw_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col("__kw_toks"))
      .persist())
    val bigrams = toks
      .select(explode(when(size(col("__kw_toks")) >= 2,
        transform(sequence(lit(0), size(col("__kw_toks")) - 2),
          i => struct(element_at(col("__kw_toks"), i + 1).as("a"),
            element_at(col("__kw_toks"), i + 2).as("b"))))
        .otherwise(array().cast(
          "array<struct<a:string,b:string>>"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val bc = graft.CacheScope.register(
      bigrams.groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= minCount)
        .persist())
    val uni = toks
      .select(explode(col("__kw_toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val total = bigrams.agg(count(lit(1)).as("__T"))
    bc
      .join(uni.select(col("w").as("a"), col("c_w").as("c_a")), Seq("a"))
      .join(uni.select(col("w").as("b"), col("c_w").as("c_b")), Seq("b"))
      .crossJoin(broadcast(total))
      .select(concat_ws(" ", col("a"), col("b")).as("bigram"),
        col("c_ab"), col("c_a"), col("c_b"),
        round(log(col("c_ab").cast("double") *
            col("__T").cast("double") /
          (col("c_a").cast("double") * col("c_b").cast("double"))), 4)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
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

  /** Chi-square distinctive terms per group — "which words mark THIS
    * source/slice against the rest": the 2×2 contingency
    * `χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))` over occurrence
    * counts (a = token in group, b = token elsewhere, c/d = the
    * complements). All counts are exact integers; the χ² is ONE fixed
    * double expression tree, so both engines evaluate the identical
    * IEEE sequence even where the squared product exceeds 2⁵³.
    *
    * Shape: one (group, token) count shuffle, one token-total and one
    * group-total partial aggregate joined back UN-hinted (token totals
    * are corpus-vocabulary cardinality — the [[tfIdfTopTerms]] rule),
    * and a top-k window per group on the (rounded χ², token) grid.
    */
  def distinctiveTerms(docs: DataFrame, groupCol: String, textCol: String,
      topK: Int = 5, tokensCol: Option[String] = None): DataFrame = {
    require(topK >= 1, s"bad topK $topK")
    val rows = docs
      .withColumn("__kw_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(groupCol), explode(col("__kw_toks")).as("token"))
    val gt = graft.CacheScope.register(rows
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("a")).persist())
    val tokTot = gt.groupBy(col("token")).agg(sum(col("a")).as("ct"))
    val grpTot = gt.groupBy(col(groupCol)).agg(sum(col("a")).as("tg"))
    val nTotal = gt.agg(sum(col("a"))).head().getLong(0)
    val a = col("a").cast("double")
    val b = (col("ct") - col("a")).cast("double")
    val c = (col("tg") - col("a")).cast("double")
    val d = (lit(nTotal) - col("tg") - (col("ct") - col("a")))
      .cast("double")
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    val chi2 = lit(nTotal.toDouble) * (a * d - b * c) * (a * d - b * c) /
      den
    val scored = gt
      .join(tokTot, Seq("token"))
      .join(grpTot, Seq(groupCol))
      .withColumn("chi2", when(den =!= 0.0, round(chi2, 4)))
      // signed: only OVER-represented terms characterize the group
      .filter(col("chi2").isNotNull && a * d > b * c)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("chi2").desc, col("token"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col(groupCol), col("rn"), col("token"), col("a").as("count"),
        col("chi2"))
  }

  /** Lexicon tagging (the LIWC/blocklist device): a config-bounded
    * (category, term) dictionary broadcasts against the exploded
    * token stream — ONE join tags every occurrence whatever the
    * category count, where the naive loop regex-scans the corpus
    * once per lexicon. Per-doc per-category hit counts and rates;
    * docs with no hits carry no rows (left-join a zero frame
    * downstream if density matters).
    */
  def lexiconTags(docs: DataFrame, idCol: String, textCol: String,
      lexicons: Map[String, Seq[String]],
      tokensCol: Option[String] = None): DataFrame = {
    require(lexicons.nonEmpty && lexicons.values.forall(_.nonEmpty),
      "empty lexicon")
    val spark = docs.sparkSession
    import spark.implicits._
    val lex = lexicons.toSeq
      .flatMap { case (cat, terms) => terms.distinct.map(cat -> _) }
      .toDF("category", "token")
    val tok = docs
      .withColumn("__lx_t",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol), size(col("__lx_t")).as("__n"),
        explode(col("__lx_t")).as("token"))
    tok.join(broadcast(lex), Seq("token"))
      .groupBy(col(idCol), col("category"))
      .agg(max(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_hits"),
        countDistinct(col("token")).as("n_distinct_terms"))
      .withColumn("hit_rate",
        round(col("n_hits") / col("n_tokens").cast("double"), 6))
  }

  /** Corpus rollup of [[lexiconTags]]: per (source-ish group,
    * category) — docs touched, occurrence mass, mean rate — the
    * moderation/profiling dashboard row.
    */
  def lexiconProfile(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, lexicons: Map[String, Seq[String]],
      tokensCol: Option[String] = None): DataFrame =
    lexiconTags(docs, idCol, textCol, lexicons, tokensCol)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
      .groupBy(col(groupCol), col("category"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_hits")).as("total_hits"),
        round(sum(col("n_hits")).cast("double") /
          sum(col("n_tokens")).cast("double"), 6).as("mass_rate"))

  /** KWIC concordance (keyword-in-context) — the corpus-inspection
    * readout every curation review wants: each occurrence of `term`
    * with `context` tokens either side, stitched from the ONCE-
    * tokenized array by pure slice arithmetic (no re-scan of the
    * text, no regex per occurrence). One tokenize pass, a map-only
    * filter, a top-k heap on (doc, pos) — nothing shuffles except
    * the final limit.
    */
  def kwic(docs: DataFrame, idCol: String, textCol: String,
      term: String, context: Int = 3, topK: Int = 100,
      tokensCol: Option[String] = None): DataFrame = {
    require(context >= 0 && topK >= 1, s"bad kwic($context, $topK)")
    val lo = greatest(col("pos") - context, lit(0))
    docs
      .withColumn("__kw_t",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol), col("__kw_t"),
        posexplode(col("__kw_t")).as(Seq("pos", "tok")))
      .filter(col("tok") === term)
      .select(col(idCol), col("pos"),
        concat_ws(" ", slice(col("__kw_t"), lo + 1, col("pos") - lo))
          .as("before"),
        col("tok").as("term"),
        concat_ws(" ", slice(col("__kw_t"), col("pos") + 2,
          lit(context))).as("after"))
      .orderBy(col(idCol), col("pos"))
      .limit(topK)
  }
}
