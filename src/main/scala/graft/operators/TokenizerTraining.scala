package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training statistics over a corpus: the adjacent-pair
  * frequency count that drives one BPE merge step, and the merge
  * application that rewrites the token stream for the next step. Training
  * a subword vocabulary IS a corpus-scale aggregation problem — each BPE
  * iteration is "count all adjacent symbol pairs, pick the most frequent,
  * rewrite" — so the engine treats it as a first-class operator family.
  *
  * 100 TB shape: [[pairFrequencies]] is explode → one partial-agg shuffle
  * (one row per distinct pair); [[topPairs]] plans the global pick as a
  * TakeOrderedAndProject heap, never a full sort. [[applyMerge]] is a
  * pure per-row Column fold — map-only, no shuffle — so a merge round
  * costs exactly one aggregation pass; the loop over rounds lives in the
  * caller, checkpointing the rewritten token column as it goes.
  */
object TokenizerTraining {

  /** Occurrence count per adjacent token pair (BPE counting base:
    * duplicates within a document all count, unlike the per-doc-distinct
    * sets dedup uses). Documents with fewer than two tokens contribute
    * nothing. Pair text is the two tokens space-joined.
    */
  def pairFrequencies(corpus: DataFrame, idCol: String, textCol: String,
      tokensCol: Option[String] = None): DataFrame =
    corpus
      .withColumn("__tt_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(explode(adjacentPairs(col("__tt_toks"))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))

  /** The `k` most frequent adjacent pairs, ties broken on pair text —
    * the merge-candidate shortlist of one BPE step.
    */
  def topPairs(corpus: DataFrame, idCol: String, textCol: String, k: Int,
      tokensCol: Option[String] = None): DataFrame =
    pairFrequencies(corpus, idCol, textCol, tokensCol)
      .orderBy(col("n").desc, col("pair"))
      .limit(k)

  /** All adjacent token pairs in order, duplicates kept; `[]` below two
    * tokens (no whole-doc fallback — a lone token is not a pair).
    */
  def adjacentPairs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => array_join(slice(toks, i + 1, lit(2)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Adjacent pairs as (left, right) STRUCTS — the multi-round counting
    * form: after a merge the stream contains tokens with embedded
    * spaces, so the space-joined pair text of [[adjacentPairs]] becomes
    * ambiguous ("a b c" could be ("a b", "c") or ("a", "b c")); structs
    * keep the boundary exact.
    */
  def adjacentPairStructs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => struct(get(toks, i).as("left"), get(toks, i + 1).as("right"))))
      .otherwise(
        array().cast("array<struct<left:string,right:string>>"))

  /** `rounds` of BPE training: each round counts adjacent pairs over the
    * CURRENT token stream (one partial-agg shuffle + a 1-row TakeOrdered
    * pick), merges the most frequent pair (ties on pair text), and
    * rewrites the stream with [[applyMerge]] — a lazy map-only Column
    * rewrite, so a round costs exactly one aggregation pass over the
    * corpus. Stops early when no pair reaches `minCount`. Returns the
    * ordered merge list (the BPE vocabulary delta).
    *
    * `checkpointEvery` bounds plan depth: each round nests one more
    * `aggregate` fold into the token expression, so every few rounds the
    * stream is localCheckpoint'd (lineage cut, same device as the
    * connected-components loop in [[Dedup]]).
    */
  def trainMerges(corpus: DataFrame, idCol: String, textCol: String,
      rounds: Int, minCount: Long = 2, tokensCol: Option[String] = None,
      checkpointEvery: Int = 8): Seq[(String, String)] = {
    var stream = corpus.select(
      tokensCol.map(col).getOrElse(TF.tokens(col(textCol))).as("__bpe"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val top = stream
        .select(explode(adjacentPairStructs(col("__bpe"))).as("p"))
        .groupBy(col("p.left").as("l"), col("p.right").as("r"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minCount) exhausted = true
      else {
        val (a, b) = (top.head.getString(0), top.head.getString(1))
        merges += ((a, b))
        stream = stream.withColumn("__bpe",
          applyMerge(col("__bpe"), a, b))
        if ((r + 1) % checkpointEvery == 0)
          stream = stream.localCheckpoint()
      }
      r += 1
    }
    merges.toSeq
  }

  /** One BPE merge applied to a token array: every adjacent occurrence of
    * (`a`, `b`) becomes the single token `a + " " + b`, scanning left to
    * right — after a merge the merged token is what the next input token
    * is compared against, so overlapping occurrences ("a a a" under
    * (a, a)) merge leftmost-first exactly like the reference BPE scan.
    *
    * Deliberately a UDF, not a Column `aggregate` fold: the fold's
    * per-element `concat(acc, array(x))` copies the accumulator each
    * step — O(n²) array allocation per document, pathological at
    * book-length token counts — while the UDF is one linear buffer scan
    * (same justification as [[TF.rollingHash]]: a linear UDF beats a
    * quadratic codegen expression; the function is pure and
    * deterministic either way).
    */
  def applyMerge(toks: Column, a: String, b: String): Column =
    mergeUdf(toks, lit(a), lit(b))

  private val mergeUdf = udf { (toks: Seq[String], a: String, b: String) =>
    if (toks == null) null
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      toks.foreach { t =>
        if (out.nonEmpty && out.last == a && t == b)
          out(out.length - 1) = a + " " + b
        else out += t
      }
      out.toSeq
    }
  }
}
