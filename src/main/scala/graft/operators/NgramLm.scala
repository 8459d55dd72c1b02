package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model scoring — the CCNet-style quality
  * scorer: train a bigram LM on a REFERENCE corpus (CCNet uses
  * Wikipedia; any trusted split works), then score candidate documents
  * by their average smoothed bigram log-probability. Low scores flag
  * garbled/boilerplate/machine text; the score feeds the same
  * bucket-and-select machinery as every other quality signal
  * ([[CorpusSelection]], [[Sampling]]).
  *
  * The model is add-α smoothed:
  * `lp(w1 w2) = ln((c(w1,w2) + α) / (c(w1) + α·V))`, V = trained
  * unigram vocabulary size. No backoff — the add-α floor plays that
  * role; unseen bigrams and OOV contexts score through coalesce(0).
  *
  * 100 TB shape: training is two partial-agg shuffles (unigram, bigram
  * counts — corpus-cardinality tables that STAY distributed; the only
  * driver fact is V, one long). Scoring is an adjacent-pair explode and
  * two UN-HINTED equi-joins against the count tables (the [[Keywords]]
  * df-join rule: AQE broadcasts them only when the runtime size fits —
  * a trained reference LM usually does fit, but the worst case is
  * corpus-cardinality and must not be forced), then one aggregation
  * back to document grain. Cross-engine determinism: `ln` is rounded to
  * the 1e-4 grid AFTER the per-doc average (the q69 rounded-grid
  * device); the fraction itself is IEEE-exact per pair.
  */
object NgramLm {

  /** A trained bigram LM: distributed count tables + the vocab size.
    * `bigrams`: (l, r, c2); `unigrams`: (l, c1); `vocab` = |distinct
    * training tokens| — the one driver-side bounded fact.
    */
  final case class Lm(bigrams: DataFrame, unigrams: DataFrame, vocab: Long)

  /** Count tables from the reference corpus. `tokensCol` joins the
    * tokenize-once contract as everywhere else.
    */
  def train(corpus: DataFrame, idCol: String, textCol: String,
      tokensCol: Option[String] = None): Lm = {
    // the tokenized reference feeds both count aggregations, and the
    // unigram table feeds both the vocab count and the scoring join —
    // scope-cached so each pass runs once (CacheScope contract)
    val toks = graft.CacheScope.register(corpus
      .withColumn("__lm_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col("__lm_toks"))
      .persist())
    val unigrams = graft.CacheScope.register(toks
      .select(explode(col("__lm_toks")).as("l"))
      .groupBy(col("l")).agg(count(lit(1)).as("c1"))
      .persist())
    val bigrams = toks
      .select(explode(
        TokenizerTraining.adjacentPairStructs(col("__lm_toks"))).as("p"))
      .groupBy(col("p.left").as("l"), col("p.right").as("r"))
      .agg(count(lit(1)).as("c2"))
    Lm(bigrams, unigrams, unigrams.count())
  }

  /** Per-document LM score: one row per scored doc with `n_pairs`
    * (adjacent bigrams) and `avg_lp` (average smoothed bigram ln-prob,
    * rounded to 4 decimals). Documents with fewer than two tokens have
    * no bigrams and emit no row — score them with unigram statistics or
    * drop them in quality filtering upstream.
    */
  def logProbScore(docs: DataFrame, idCol: String, textCol: String,
      lm: Lm, alpha: Double = 0.4,
      tokensCol: Option[String] = None): DataFrame = {
    require(alpha > 0, s"alpha $alpha must be positive (it is the floor)")
    val pairs = docs
      .withColumn("__lm_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol),
        explode(
          TokenizerTraining.adjacentPairStructs(col("__lm_toks"))).as("p"))
      .select(col(idCol), col("p.left").as("l"), col("p.right").as("r"))
    pairs
      .join(lm.bigrams, Seq("l", "r"), "left") // un-hinted: see object doc
      .join(lm.unigrams, Seq("l"), "left")
      .withColumn("__lp",
        log((coalesce(col("c2"), lit(0L)) + lit(alpha)) /
          (coalesce(col("c1"), lit(0L)) + lit(alpha * lm.vocab))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("__lp")), 4).as("avg_lp"))
  }
}
