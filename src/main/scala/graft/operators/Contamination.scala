package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step that drops
  * (or flags) corpus documents overlapping an evaluation set, so test
  * questions never leak into training text. Standard practice for LLM
  * corpora: exact n-gram collision against the benchmark text (the
  * GPT-3/PaLM-style "13-gram overlap" rule, here with configurable n).
  *
  * 100 TB shape: benchmarks are megabytes while the corpus is the 100 TB
  * side, so the benchmark n-gram set is built once, deduplicated, and
  * BROADCAST; the corpus side is a shingle-explode followed by a
  * broadcast LEFT SEMI join (no shuffle of the corpus, no state beyond
  * the broadcast map) and a single aggregation back to document grain.
  */
object Contamination {

  /** Corpus rows tagged `is_contaminated` = shares at least one `n`-gram
    * with any benchmark row. All columns of `corpus` are preserved.
    *
    * `tokensCol`: name of an already-materialized corpus token-array
    * column to shingle from (the tokenize-once contract — see
    * [[CorpusPipeline.prepare]]); the benchmark side always tokenizes
    * itself (it is megabytes).
    */
  def flagContaminated(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      tokensCol: Option[String] = None): DataFrame = {
    // tokens are materialized in their own projection BEFORE the shingle
    // explode: inlining tokens(text) into the shingle lambda re-runs the
    // regexp split per shingle element (higher-order functions re-evaluate
    // argument subtrees) — measured 4.5 s vs 0.2 s on the sf0.1 corpus
    val benchGrams = benchmark
      .withColumn("__ct_toks", TF.tokens(col(benchTextCol)))
      .select(explode(TF.shinglesOf(col("__ct_toks"), n)).as("gram"))
      .distinct()
    val hits = corpus
      .withColumn("__ct_toks",
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .select(col(idCol), explode(TF.shinglesOf(col("__ct_toks"), n)).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .select(col(idCol)).distinct()
      .withColumn("is_contaminated", lit(true))
    // the flagged-id set is at most benchmark-sized collisions — broadcast
    // it too, or a stats misestimate plans a sort-merge join that shuffles
    // the full corpus (the exact cost this operator exists to avoid)
    corpus.join(broadcast(hits), Seq(idCol), "left")
      .withColumn("is_contaminated",
        coalesce(col("is_contaminated"), lit(false)))
  }

  /** The filter form: corpus minus contaminated docs (broadcast anti-join
    * against the flagged id set).
    */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 8,
      tokensCol: Option[String] = None): DataFrame =
    flagContaminated(corpus, idCol, textCol, benchmark, benchTextCol, n,
        tokensCol)
      .filter(!col("is_contaminated"))
      .drop("is_contaminated")
}
