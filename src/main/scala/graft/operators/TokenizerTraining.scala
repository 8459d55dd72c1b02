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

  /** One BPE merge applied to a token array: every adjacent occurrence of
    * (`a`, `b`) becomes the single token `a + " " + b`, scanning left to
    * right — after a merge the merged token is what the next input token
    * is compared against, so overlapping occurrences ("a a a" under
    * (a, a)) merge leftmost-first exactly like the reference BPE scan.
    * Pure Column fold (no UDF): stays inside codegen.
    */
  def applyMerge(toks: Column, a: String, b: String): Column = {
    val merged = a + " " + b
    aggregate(toks, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
          .otherwise(concat(acc, array(x))))
  }
}
