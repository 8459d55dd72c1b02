package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable document-quality filtering — the C4/Gopher-style keep/drop
  * stage of a training-data pipeline. Each rule is a named predicate over
  * the text column; [[annotate]] tags every row with the FIRST failing
  * rule (or null = keep), so a pipeline can audit exactly why volume was
  * dropped — at 100 TB, "we lost 31% to min_tokens" must be a queryable
  * fact, not a guess. [[keep]] is the filter form.
  *
  * All rules are pure Column predicates: the whole stage is one narrow
  * projection + filter inside whole-stage codegen — no shuffle, no UDF.
  */
object QualityFilters {

  /** One named drop rule: `fails` is TRUE when the document fails it. */
  final case class Rule(name: String, fails: Column)

  /** The standard rule set, tunable thresholds. Order matters: the first
    * failing rule names the drop reason.
    */
  def standardRules(text: Column,
      minTokens: Int = 10, maxTokens: Int = 100000,
      maxDupNgramFraction: Double = 0.6,
      maxPunctPerToken: Double = 0.5): Seq[Rule] = {
    val nToks = TF.tokenCount(text)
    Seq(
      Rule("min_tokens", nToks < minTokens),
      Rule("max_tokens", nToks > maxTokens),
      Rule("repetition",
        TF.dupNgramFraction(text, 3) > maxDupNgramFraction),
      Rule("punct_ratio",
        TF.punctCount(text).cast("double") > nToks * maxPunctPerToken))
  }

  /** Tag every row with `drop_reason` (null = keeps all rules). */
  def annotate(df: DataFrame, textCol: String,
      rules: Seq[Rule] = null): DataFrame = {
    val rs = Option(rules).getOrElse(standardRules(col(textCol)))
    val reason = rs.foldRight(lit(null).cast("string")) { (r, acc) =>
      when(r.fails, r.name).otherwise(acc)
    }
    df.withColumn("drop_reason", reason)
  }

  /** Rows passing every rule (the production filter form). */
  def keep(df: DataFrame, textCol: String,
      rules: Seq[Rule] = null): DataFrame =
    annotate(df, textCol, rules)
      .filter(col("drop_reason").isNull).drop("drop_reason")

  /** Per-reason drop accounting: (drop_reason, n) with null = kept. */
  def audit(df: DataFrame, textCol: String,
      rules: Seq[Rule] = null): DataFrame =
    annotate(df, textCol, rules)
      .groupBy(col("drop_reason")).agg(count(lit(1)).as("n"))
}
