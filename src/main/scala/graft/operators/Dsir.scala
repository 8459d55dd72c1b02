package graft.operators

import graft.expressions.HashExpressions
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) — the published recipe for picking raw-corpus
  * documents that LOOK LIKE a small trusted target corpus: model both
  * corpora as bags of hashed n-gram features, then weight each raw
  * document by the log-likelihood ratio of its features under the
  * target vs the raw distribution. High `log_w` = "distributionally
  * close to the target"; selection takes the top mass (or Gumbel-noised
  * resampling — here the deterministic top-k, consistent with every
  * other sampler in this library being splitmix-pure).
  *
  * Features are unigrams + bigrams hashed into `numBuckets` buckets
  * (the paper's hashed n-gram parameterization) via the codegen'd
  * engine-independent FNV-1a ([[HashExpressions.fnv1a64]]), so a DuckDB
  * oracle replays bucket ids exactly. Both distributions are add-α
  * smoothed over the bucket space:
  * `llr_b = ln((c_t(b) + α)/(T_t + α·B)) − ln((c_r(b) + α)/(T_r + α·B))`
  * and `log_w(doc) = Σ_features llr_bucket(feature)`.
  *
  * 100 TB shape: the bucket space is a CONFIG bound (B rows, not corpus
  * cardinality), so both count tables and the fused llr table are
  * broadcast-safe BY CONSTRUCTION — the corpus side is one explode +
  * one broadcast join + one partial-agg groupBy back to document grain;
  * no corpus-keyed shuffle besides the final per-doc sum. The only
  * driver facts are the two feature totals (two longs, the
  * [[NgramLm]] V convention).
  */
object Dsir {

  /** Unigram + bigram feature grams of a token array (no whole-doc
    * fallback — an empty doc has no features). Base tokens carry no
    * spaces, so bigram strings are unambiguous.
    */
  private def featureGrams(toks: Column): Column =
    concat(
      toks,
      when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => array_join(slice(toks, i + 1, lit(2)), " ")))
        .otherwise(array().cast("array<string>")))

  /** Stable feature bucket in `[0, numBuckets)` for a gram string. */
  def bucketOf(gram: Column, numBuckets: Int): Column =
    pmod(HashExpressions.fnv1a64(gram), lit(numBuckets.toLong))

  /** One row per (doc, feature occurrence): (`idCol`, bucket). Tokens
    * are materialized in their own projection BEFORE the gram lambdas
    * (the HOF re-evaluation trap — see [[Contamination]]).
    */
  def hashedFeatureRows(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int, tokensCol: Option[String] = None): DataFrame =
    df.withColumn("__ds_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol),
        explode(featureGrams(col("__ds_toks"))).as("__ds_gram"))
      .select(col(idCol),
        bucketOf(col("__ds_gram"), numBuckets).as("bucket"))

  /** `corpus` (the raw pool) plus `n_feats` (feature occurrences) and
    * `log_w` (the DSIR importance log-weight vs `target`). Documents
    * with no features carry `n_feats` = 0, `log_w` = 0.0.
    */
  def importanceWeights(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, numBuckets: Int = 512,
      alpha: Double = 1.0, tokensCol: Option[String] = None): DataFrame = {
    require(numBuckets > 0, s"bad numBuckets $numBuckets")
    require(alpha > 0, s"alpha $alpha must be positive (it is the floor)")
    val b = numBuckets
    val tFeats = hashedFeatureRows(
      target.withColumn("__ds_id", lit(0L)), "__ds_id", targetTextCol, b)
    val rFeats = graft.CacheScope.register(
      hashedFeatureRows(corpus, idCol, textCol, b, tokensCol).persist())
    val tCnt = tFeats.groupBy(col("bucket")).agg(count(lit(1)).as("c_t"))
    val rCnt = rFeats.groupBy(col("bucket")).agg(count(lit(1)).as("c_r"))
    // the two totals are the driver facts (sums over <= B-row tables)
    val tTot = tCnt.agg(coalesce(sum(col("c_t")), lit(0L)))
      .head().getLong(0)
    val rTot = rCnt.agg(coalesce(sum(col("c_r")), lit(0L)))
      .head().getLong(0)
    // fused per-bucket llr table: <= B rows by construction (a config
    // bound, not corpus cardinality) -> broadcast is structurally safe,
    // unlike the corpus-derived tables the hint budget protects
    val llr = tCnt.join(rCnt, Seq("bucket"), "full")
      .select(col("bucket"),
        (log((coalesce(col("c_t"), lit(0L)) + lit(alpha)) /
            lit(tTot + alpha * b)) -
          log((coalesce(col("c_r"), lit(0L)) + lit(alpha)) /
            lit(rTot + alpha * b))).as("llr"))
    val perDoc = rFeats
      .join(broadcast(llr), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("llr")).as("log_w"))
    corpus.join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_feats"))
      .na.fill(0.0, Seq("log_w"))
  }

  /** The selection form: top-`k` raw documents by importance weight,
    * ties broken on the id — `TakeOrdered` at the physical level (a
    * bounded result, never a global sort materialization).
    */
  def selectTopK(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, k: Int,
      numBuckets: Int = 512, alpha: Double = 1.0,
      tokensCol: Option[String] = None): DataFrame =
    importanceWeights(corpus, idCol, textCol, target, targetTextCol,
        numBuckets, alpha, tokensCol)
      .orderBy(col("log_w").desc, col(idCol))
      .limit(k)
}
