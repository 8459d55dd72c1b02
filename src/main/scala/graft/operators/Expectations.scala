package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ / Great-Expectations
  * pattern as a Spark-native operator: rules are named boolean `Column`s,
  * and the audit is ONE conditional-aggregation pass over the corpus (a
  * rule per column expression, never a pass per rule), unpivoted to the
  * per-rule report a quality gate consumes.
  *
  * NULL rule results count as violations (a rule that cannot be
  * evaluated has not been satisfied — the strict reading every quality
  * gate wants; wrap a rule in `coalesce(..., lit(true))` to opt out).
  *
  * Scale shape: `audit` is a single partial-aggregable corpus pass
  * whatever the rule count; `violations` is one filter pass that tags
  * each failing row with exactly the rules it broke.
  */
object Expectations {

  private def violated(rule: Column): Column =
    when(coalesce(rule, lit(false)), 0L).otherwise(1L)

  /** Per-rule audit: `(rule, n_rows, n_violations, pass_rate)` — one
    * row per rule from one corpus pass (conditional sums wide, then a
    * `stack` unpivot of the 1-row aggregate).
    */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.map(_._1).distinct.size == rules.size,
      "duplicate rule names")
    val aggs = count(lit(1)).as("__n") +:
      rules.map { case (nm, c) => sum(violated(c)).as(s"__v_$nm") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (nm, _) =>
      s"'$nm', __v_$nm" }.mkString(", ")
    wide.select(col("__n"),
        expr(s"stack(${rules.size}, $stackArgs)")
          .as(Seq("rule", "n_violations")))
      .select(col("rule"), col("__n").as("n_rows"), col("n_violations"),
        round(lit(1.0) - col("n_violations") /
          col("__n").cast("double"), 6).as("pass_rate"))
  }

  /** Rows breaking ANY rule, each tagged with the array of rule names
    * it broke — the exemplar feed for a quality triage queue.
    */
  def violations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    val tags = array(rules.map { case (nm, c) =>
      when(violated(c) === 1L, lit(nm)) }: _*)
    df.withColumn("failed_rules",
        filter(tags, x => x.isNotNull))
      .filter(size(col("failed_rules")) > 0)
  }
}
