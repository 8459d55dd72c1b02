package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequent n-gram ("boilerplate") detection — the C4/RefinedWeb
  * hygiene step that catches templated text (navigation chrome, cookie
  * banners, license headers) which per-document quality rules miss: a
  * document is flagged when too many of its n-grams are SHARED with many
  * other documents.
  *
  * 100 TB shape: one shuffle computes the gram → document-frequency map
  * (partial aggregation keeps the shuffle at one row per distinct gram);
  * the frequent-gram set (grams in ≥ `minDf` docs) joins back as a PLAIN
  * equi-join — at web scale even the ≥3-doc gram set is huge (templated
  * text is why this operator exists), so the join must be allowed to
  * degrade to a shuffle; AQE broadcasts it whenever the runtime size
  * fits (as it does at test scale). Per-document accounting is then one
  * aggregation on the doc id. Nothing all-pairs, nothing driver-side.
  */
object Boilerplate {

  /** Document frequency per distinct n-gram: (gram, df) where df counts
    * DOCUMENTS containing the gram (each doc contributes each gram once —
    * shingles are per-doc distinct).
    */
  def gramDocFrequencies(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, tokensCol: Option[String] = None): DataFrame =
    grams(corpus, idCol, textCol, n, tokensCol)
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))

  /** Every row of `corpus` with per-doc boilerplate accounting:
    * `n_grams` (distinct n-grams in the doc), `n_frequent` (of those, how
    * many appear in ≥ `minDf` docs corpus-wide), and `is_boilerplate`
    * (`n_frequent / n_grams > maxFraction`).
    *
    * The (id, gram) explode feeds BOTH the df aggregation and the per-doc
    * accounting, so it is persisted for the duration of the call and its
    * ownership registered with the active [[graft.CacheScope]] (same
    * contract as `Dedup.dedupCorpus`) — without the cache the corpus
    * would be tokenized and shingled twice. `tokensCol` joins the
    * tokenize-once pipeline (see [[CorpusPipeline.prepare]]).
    */
  def flagBoilerplate(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDf: Long = 3, maxFraction: Double = 0.5,
      tokensCol: Option[String] = None): DataFrame = {
    val g = graft.CacheScope.register(
      grams(corpus, idCol, textCol, n, tokensCol).persist())
    val frequent = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .select(col("gram"), lit(1).as("__freq"))
    // one aggregation does both counts: total grams and frequent grams.
    // NO broadcast hint on `frequent`: its cardinality is the count of
    // grams shared by >= minDf documents — for a heavily templated
    // 100 TB corpus that is corpus-scale, and a forced hint never
    // degrades (the driver would build the table and die). The plain
    // equi-join lets AQE pick broadcast exactly when the runtime size
    // fits, which is the degrade-to-shuffle story documented above.
    val perDoc = g
      .join(frequent, Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__freq"), lit(0))).cast("long").as("n_frequent"))
      .withColumn("is_boilerplate",
        col("n_frequent").cast("double") >
          col("n_grams").cast("double") * maxFraction)
    corpus.join(perDoc, Seq(idCol), "left")
      // zero-token docs produce one empty-string gram, so every doc HAS
      // grams; the left join is belt-and-braces for null text
      .na.fill(0L, Seq("n_grams", "n_frequent"))
      .na.fill(false, Seq("is_boilerplate"))
  }

  /** (id, gram) pairs, one row per DISTINCT gram per doc. Tokens are
    * materialized in their own projection before the shingle transform
    * (the higher-order-function re-evaluation trap — see
    * [[graft.functions.TextFunctions.shinglesOf]]), or taken from the
    * caller's `tokensCol` under the tokenize-once contract.
    */
  private def grams(corpus: DataFrame, idCol: String, textCol: String,
      n: Int, tokensCol: Option[String]): DataFrame =
    corpus
      .withColumn("__bp_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol),
        explode(TF.shinglesOf(col("__bp_toks"), n)).as("gram"))
}
