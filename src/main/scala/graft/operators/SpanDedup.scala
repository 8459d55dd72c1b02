package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact span-level duplication — the "no training document should repeat
  * a long verbatim passage of another" criterion (the k-token exact
  * substring dedup popularized for LLM corpora; span ≈ 50 tokens in the
  * published recipes, configurable here).
  *
  * 100 TB shape: each document explodes to its distinct k-token spans
  * ONCE; span identity travels as the 8-byte `xxhash64` of the span text
  * (a 50-token span is ~300 bytes — hashing cuts the shuffle ~40×; a
  * cross-span hash collision inventing a false shared span is ~2⁻⁶⁴ per
  * bucket, the same accepted divergence as the LSH band keys). Pair
  * generation is an equi-join on the span hash, NEVER all-pairs, and the
  * `maxDf` hub cap keeps template spans (present in hundreds of
  * documents — [[Boilerplate]]'s territory, not dedup's) from exploding
  * the join quadratically: a span in more than `maxDf` documents is
  * boilerplate evidence, not a copying edge.
  */
object SpanDedup {

  /** Distinct (id, span-hash) rows: the exploded inverted-index side.
    * Map-only: `shinglesOf` is per-doc distinct already (array_distinct),
    * so no dedup shuffle is needed — (id, h) rows are distinct by
    * construction (up to the accepted 2⁻⁶⁴ within-doc hash collision).
    */
  private def spanRows(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, tokensCol: Option[String]): DataFrame =
    // tokens materialized in their own projection BEFORE the shingle
    // lambda — inlining tokens(text) re-runs the regexp split per
    // shingle element (the HOF re-evaluation trap; q82 4.3 s -> 0.6 s
    // at sf0.1, the same measured fix as Contamination's)
    df.withColumn("__sp_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol).as("id"),
        explode(TF.shinglesOf(col("__sp_toks"), spanTokens)).as("span"))
      .select(col("id"), xxhash64(col("span")).as("h"))

  /** Document pairs sharing ≥1 exact `spanTokens`-token span, with the
    * count of distinct shared spans per pair. Spans present in more than
    * `maxDf` documents are excluded (hub cap, see object doc); spans in
    * fewer than 2 trivially pair with nobody and are dropped before the
    * self-join, so the join's input is exactly the duplicated-span
    * inverted index.
    */
  def sharedSpanPairs(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, maxDf: Int = 50,
      tokensCol: Option[String] = None): DataFrame = {
    // the explode feeds the df aggregation AND both sides of the pair
    // join — cached for the duration of the call (CacheScope contract,
    // same as Boilerplate/Novelty); uncached, the tokenize+shingle pass
    // re-ran up to 4x and the bench showed it (q82 8.9 s -> 1.3 s)
    val rows = graft.CacheScope.register(
      spanRows(df, idCol, textCol, spanTokens, tokensCol).persist())
    // span df (documents per span) is one partial-agg shuffle; the
    // 2..maxDf filter bounds each span's contribution to ≤ maxDf²/2
    // pairs BEFORE the self-join. Cached too: the self-join reads it
    // twice, and recomputing it costs the df shuffle each time.
    val eligible = graft.CacheScope.register(
      rows.join(
        rows.groupBy(col("h")).agg(count(lit(1)).as("__df"))
          .filter(col("__df").between(2, maxDf))
          .select(col("h")),
        Seq("h")).persist())
    eligible.as("a").join(eligible.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("n_shared_spans"))
  }

  /** Per-document verdict: does any of the document's spans also occur
    * in another document (within the `maxDf` cap)? Returns `df` plus
    * `n_dup_spans` (distinct spans of this doc shared with ≥1 other) and
    * `has_dup_span`. The doc-level reduction of [[sharedSpanPairs]] —
    * same inverted index, no pair join at all (the df table already
    * knows which spans are shared), so it scales past the pair form.
    */
  def flagSpanDuplicated(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, maxDf: Int = 50,
      tokensCol: Option[String] = None): DataFrame = {
    // same double-use (agg + join back) -> same scoped cache
    val rows = graft.CacheScope.register(
      spanRows(df, idCol, textCol, spanTokens, tokensCol).persist())
    val shared = rows.groupBy(col("h")).agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2, maxDf))
      .select(col("h"))
    val perDoc = rows.join(shared, Seq("h"))
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_dup_spans"))
    df.join(perDoc, Seq(idCol), "left")
      .na.fill(0L, Seq("n_dup_spans"))
      .withColumn("has_dup_span", col("n_dup_spans") > 0)
  }

  /** Exposed for spec-level equivalence checks. */
  def spanHash(span: Column): Column = xxhash64(span)
}
