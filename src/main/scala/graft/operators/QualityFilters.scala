package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable document-quality filtering — the C4/Gopher-style keep/drop
  * stage of a training-data pipeline. Each document is tagged with the
  * FIRST failing rule (or null = keep), so a pipeline can audit exactly
  * why volume was dropped — at 100 TB, "we lost 31% to min_tokens" must
  * be a queryable fact, not a guess.
  *
  * The token array and n-gram list are materialized ONCE per row in a
  * separate projection before the rule expressions consume them: inlining
  * `tokens(text)` into every rule would re-run the regexp split per
  * n-gram lambda element (higher-order functions re-evaluate argument
  * subtrees), which measured 30x slower at sf0.1. CollapseProject leaves
  * the split alone because the alias is expensive and multiply
  * referenced. No shuffle, no UDF.
  */
object QualityFilters {

  /** Tunable thresholds for the standard rule set. Rule order (first
    * failure names the reason): min_tokens, max_tokens, repetition,
    * punct_ratio.
    */
  final case class Thresholds(
      minTokens: Int = 10,
      maxTokens: Int = 100000,
      maxDupNgramFraction: Double = 0.6,
      maxPunctPerToken: Double = 0.5)

  /** One named drop rule: `fails` is TRUE when the document fails it.
    * For custom rule sets via [[annotateWith]]; prefer [[annotate]] and
    * [[Thresholds]] for the standard rules (it shares the tokenization).
    */
  final case class Rule(name: String, fails: Column)

  private def firstFailing(rules: Seq[Rule]): Column =
    rules.foldRight(lit(null).cast("string")) { (r, acc) =>
      when(r.fails, r.name).otherwise(acc)
    }

  /** Tag every row with `drop_reason` (null = keeps all rules).
    *
    * `tokensCol`: name of an ALREADY-MATERIALIZED token-array column to
    * rule on instead of re-tokenizing `textCol` — the tokenize-once
    * contract ([[CorpusPipeline.prepare]] tokenizes the corpus a single
    * time and threads the column through quality, decontamination, and
    * dedup; at 100 TB each avoided re-tokenization is a full-corpus
    * regexp pass).
    */
  def annotate(df: DataFrame, textCol: String,
      t: Thresholds = Thresholds(),
      tokensCol: Option[String] = None): DataFrame = {
    val toksCol = "__qf_toks"
    val gramsCol = "__qf_g3"
    val nToks = size(col(toksCol))
    val dupFrac = when(size(col(gramsCol)) === 0, lit(0.0)).otherwise(
      (size(col(gramsCol)) - size(array_distinct(col(gramsCol))))
        .cast("double") / size(col(gramsCol)))
    val rules = Seq(
      // explicit: NULL text must not sail through (every other rule
      // evaluates to NULL on it, which when() treats as not-failing)
      Rule("null_text", col(textCol).isNull),
      Rule("min_tokens", nToks < t.minTokens),
      Rule("max_tokens", nToks > t.maxTokens),
      Rule("repetition", dupFrac > t.maxDupNgramFraction),
      Rule("punct_ratio", TF.punctCount(col(textCol)).cast("double") >
        nToks * t.maxPunctPerToken))
    df.withColumn(toksCol,
        tokensCol.map(col).getOrElse(TF.tokens(col(textCol))))
      .withColumn(gramsCol, TF.ngramsOf(col(toksCol), 3))
      .withColumn("drop_reason", firstFailing(rules))
      .drop(toksCol, gramsCol)
  }

  /** Custom-rule form: caller-supplied predicates over their own columns.
    * Callers referencing `tokens(text)` in several rules should project
    * it to a column first (see the class doc).
    */
  def annotateWith(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn("drop_reason", firstFailing(rules))

  /** Rows passing every rule (the production filter form).
    *
    * The keep decision is PROJECTED through
    * [[graft.expressions.PushdownBarrier]] and the filter tests only that
    * column, instead of filtering `col("drop_reason").isNull` directly:
    * `PushPredicateThroughNonJoin` substitutes aliases into any filter
    * above a fully-deterministic projection with no cost model (the
    * CONDITION's determinism is irrelevant — a per-row predicate commutes
    * with a deterministic projection), reconstructing the token split
    * ~15 times inside one mega-predicate at the scan — measured 22 s vs
    * 1 s on sf0.1. Marking the PROJECTED FIELD non-deterministic is what
    * fails the rule's `fields.forall(_.deterministic)` guard and pins the
    * filter above the projection, while the barrier code-generates as the
    * plain null check — unlike the previous typed `Row => Boolean`
    * filter, which also blocked substitution but deserialized every row
    * out of Tungsten and ended the whole-stage-codegen span.
    */
  def keep(df: DataFrame, textCol: String,
      t: Thresholds = Thresholds(),
      tokensCol: Option[String] = None): DataFrame =
    annotate(df, textCol, t, tokensCol)
      .withColumn("__keep_ok",
        graft.expressions.PushdownBarrier.barrier(col("drop_reason")).isNull)
      .filter(col("__keep_ok"))
      .drop("__keep_ok", "drop_reason")

  /** Per-reason drop accounting: (drop_reason, n) with null = kept. */
  def audit(df: DataFrame, textCol: String,
      t: Thresholds = Thresholds()): DataFrame =
    annotate(df, textCol, t)
      .groupBy(col("drop_reason")).agg(count(lit(1)).as("n"))
}
