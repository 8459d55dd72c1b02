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
  * idf side (one row per distinct token above the df floor) joins back
  * broadcast for real vocabulary sizes; the per-doc top-k is a window
  * over the doc key — partitioned by document, so no global sort.
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
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = docs
      .withColumn("__kw_toks", TF.tokens(col(textCol)))
      .select(col(idCol), explode(col("__kw_toks")).as("token"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("__N"))
    val scored = tf
      .join(broadcast(df), Seq("token"))
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
    * hundred thousand rows against a corpus of billions.
    */
  def oovAgainstVocab(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val toks = docs
      .withColumn("__kw_toks", TF.tokens(col(textCol)))
      .select(col(idCol), explode(col("__kw_toks")).as("token"))
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
}
