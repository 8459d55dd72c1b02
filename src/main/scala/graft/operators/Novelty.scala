package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-occurrence n-gram novelty — "how much of this document has the
  * corpus not seen before it?" The per-document complement of
  * [[Boilerplate]]: where boilerplate counts grams SHARED with many other
  * documents, novelty counts grams whose FIRST occurrence (in `idCol`
  * order — ingestion order for monotonically assigned ids) is this
  * document. Low-novelty documents are re-crawls, mirrors, and template
  * spam; the signal is used to rank sources by marginal contribution and
  * to early-drop near-copies before the (more expensive) MinHash pass.
  *
  * 100 TB shape: one shuffle computes gram → first doc id (partial
  * aggregation — `min` combines map-side, so the shuffle carries one row
  * per distinct gram per partition); the first-seen map joins back as a
  * PLAIN equi-join on the gram — the same corpus-scale-cardinality
  * reasoning as [[Boilerplate.flagBoilerplate]]: never force a broadcast
  * of a distinct-gram table, AQE picks broadcast only when the runtime
  * size fits. Per-document accounting is one aggregation on the doc id.
  */
object Novelty {

  /** Every row of `corpus` with `n_grams` (distinct n-grams in the doc)
    * and `n_novel` (of those, how many first appear at this doc id).
    * Novelty fraction is `n_novel / n_grams` — left on the integer grid
    * for engine-independent comparison; divide downstream.
    *
    * The (id, gram) explode feeds both the first-seen aggregation and the
    * per-doc accounting, so it is persisted for the duration of the call
    * (ownership registered with the active [[graft.CacheScope]], same
    * contract as [[Boilerplate.flagBoilerplate]]). `tokensCol` joins the
    * tokenize-once pipeline.
    */
  def gramNovelty(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tokensCol: Option[String] = None): DataFrame = {
    val g = graft.CacheScope.register(
      corpus
        .withColumn("__nv_toks",
          tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
        .select(col(idCol),
          explode(TF.shinglesOf(col("__nv_toks"), n)).as("gram"))
        .persist())
    val first = g.groupBy(col("gram")).agg(min(col(idCol)).as("__first_id"))
    val perDoc = g
      .join(first, Seq("gram")) // plain equi-join; see scale note above
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col(idCol) === col("__first_id"), 1).otherwise(0))
          .cast("long").as("n_novel"))
    corpus.join(perDoc, Seq(idCol), "left")
      // zero-token docs still emit one empty-string gram (shingle
      // fallback), so the left join only guards null text
      .na.fill(0L, Seq("n_grams", "n_novel"))
  }

  /** Per-group lexical-diversity profile: token/type counts and
    * type-token ratios at unigram and `n`-gram order — the cheap
    * Self-BLEU stand-in ("how templated is this source?") curation
    * dashboards key on: a source whose trigram TTR collapses while its
    * unigram TTR holds is emitting the same sentences with the same
    * words rearranged, i.e. boilerplate spam that per-doc dedup misses.
    *
    * Two aggregations over the tokenized corpus (one per gram order);
    * each is a partial-aggregating groupBy on the group key — no
    * row-grain shuffle, and `count_distinct` rewrites to the standard
    * two-level expand internally. N-grams use [[TF.ngramsOf]] WITH
    * duplicates (TTR is about repetition, so the raw stream counts) and
    * its whole-doc fallback below `n` tokens.
    */
  def typeTokenProfile(corpus: DataFrame, groupCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val base = corpus.select(col(groupCol),
      TF.tokens(col(textCol)).as("__nv_t"))
    val uni = base
      .select(col(groupCol), explode(col("__nv_t")).as("w"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("w")).as("n_types"))
    val grams = base
      .select(col(groupCol), explode(TF.ngramsOf(col("__nv_t"), n)).as("g"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_gram_types"))
    uni.join(grams, Seq(groupCol))
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        round(col("n_types") / col("n_tokens"), 4).as("ttr_uni"),
        col("n_grams"), col("n_gram_types"),
        round(col("n_gram_types") / col("n_grams"), 4).as("ttr_gram"))
  }
}
