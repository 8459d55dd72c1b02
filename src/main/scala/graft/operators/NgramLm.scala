package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring — the CCNet-style quality
  * scorer: train an n-gram LM on a REFERENCE corpus (CCNet uses a
  * 5-gram KenLM over Wikipedia; any trusted split and order works),
  * then score candidate documents by their average smoothed n-gram
  * log-probability. Low scores flag garbled/boilerplate/machine text;
  * the score feeds the same bucket-and-select machinery as every other
  * quality signal ([[CorpusSelection]], [[Sampling]]).
  *
  * The model is add-α smoothed with an (n-1)-gram context:
  * `lp(w_1..w_n) = ln((c(w_1..w_n) + α) / (c(w_1..w_{n-1}) + α·V))`,
  * V = trained unigram vocabulary size. At `n = 2` this is the classic
  * bigram-over-unigram form. No backoff — the add-α floor plays that
  * role; unseen n-grams and OOV contexts score through coalesce(0).
  * N-grams are counted WITHOUT the whole-doc fallback ([[grams]]): a
  * document below n tokens contributes no n-grams and, when scored,
  * emits no row.
  *
  * 100 TB shape: training is two partial-agg shuffles (n-gram and
  * context counts — corpus-cardinality tables that STAY distributed;
  * the only driver fact is V, one long). Scoring is one gram+context
  * explode and two UN-HINTED equi-joins against the count tables (the
  * [[Keywords]] df-join rule: AQE broadcasts them only when the runtime
  * size fits — a trained reference LM usually does fit, but the worst
  * case is corpus-cardinality and must not be forced), then one
  * aggregation back to document grain. Cross-engine determinism: `ln`
  * is rounded to the 1e-4 grid AFTER the per-doc average (the q69
  * rounded-grid device); the fraction itself is IEEE-exact per gram.
  */
object NgramLm {

  /** A trained n-gram LM: distributed count tables + the vocab size.
    * `ngrams`: (gram, c_n) over space-joined n-grams; `contexts`:
    * (ctx, c_ctx) over (n-1)-grams; `vocab` = |distinct training
    * tokens| — the one driver-side bounded fact; `n` the order.
    */
  final case class Lm(ngrams: DataFrame, contexts: DataFrame, vocab: Long,
      n: Int)

  /** Space-joined `n`-grams with NO whole-doc fallback: `[]` below `n`
    * tokens (a short document is not an n-gram — fallback semantics
    * belong to the dedup shingles, not LM counting). Base tokens carry
    * no spaces, so the joined string is unambiguous.
    */
  private def grams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Count tables from the reference corpus. `tokensCol` joins the
    * tokenize-once contract as everywhere else.
    */
  def train(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 2, tokensCol: Option[String] = None): Lm = {
    require(n >= 2, s"order $n must be >= 2 (the context is n-1 grams)")
    // the tokenized reference feeds both count aggregations, and the
    // context table feeds the scoring join — scope-cached so each pass
    // runs once (CacheScope contract). Tokens are materialized BEFORE
    // the gram lambdas (HOF re-evaluation trap).
    val toks = graft.CacheScope.register(corpus
      .withColumn("__lm_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col("__lm_toks"))
      .persist())
    val contexts = graft.CacheScope.register(toks
      .select(explode(grams(col("__lm_toks"), n - 1)).as("ctx"))
      .groupBy(col("ctx")).agg(count(lit(1)).as("c_ctx"))
      .persist())
    val ngrams = toks
      .select(explode(grams(col("__lm_toks"), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c_n"))
    val vocab =
      if (n == 2) contexts.count() // the contexts ARE the unigrams
      else toks.select(explode(col("__lm_toks")).as("w"))
        .distinct().count()
    Lm(ngrams, contexts, vocab, n)
  }

  /** Per-document LM score: one row per scored doc with `n_grams`
    * (n-grams in the doc) and `avg_lp` (average smoothed ln-prob,
    * rounded to 4 decimals). Documents below `lm.n` tokens have no
    * n-grams and emit no row — score them with lower-order statistics
    * or drop them in quality filtering upstream.
    */
  def logProbScore(docs: DataFrame, idCol: String, textCol: String,
      lm: Lm, alpha: Double = 0.4,
      tokensCol: Option[String] = None): DataFrame = {
    require(alpha > 0, s"alpha $alpha must be positive (it is the floor)")
    val n = lm.n
    val pairs = docs
      .withColumn("__lm_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol),
        explode(when(size(col("__lm_toks")) >= n,
          transform(sequence(lit(0), size(col("__lm_toks")) - n),
            i => struct(
              array_join(slice(col("__lm_toks"), i + 1, lit(n)), " ")
                .as("gram"),
              array_join(slice(col("__lm_toks"), i + 1, lit(n - 1)), " ")
                .as("ctx"))))
          .otherwise(array().cast(
            "array<struct<gram:string,ctx:string>>"))).as("p"))
      .select(col(idCol), col("p.gram").as("gram"), col("p.ctx").as("ctx"))
    pairs
      .join(lm.ngrams, Seq("gram"), "left") // un-hinted: see object doc
      .join(lm.contexts, Seq("ctx"), "left")
      .withColumn("__lp",
        log((coalesce(col("c_n"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c_ctx"), lit(0L)) + lit(alpha * lm.vocab))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        round(avg(col("__lp")), 4).as("avg_lp"))
  }
}
