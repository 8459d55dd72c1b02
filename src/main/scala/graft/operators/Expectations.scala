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

  /** Referential-integrity audit for one FK edge — the cross-TABLE
    * expectation [[audit]]'s row-local rules cannot express: child
    * rows whose `fkCol` has no match in `parent.pkCol` (orphans —
    * null FKs counted separately, they are a different defect), and
    * parent rows never referenced (coverage — dead dimension
    * entries). ONE pass: both sides aggregate to key grain, a full
    * outer join classifies every key, one final aggregate emits the
    * summary row — the comparison never runs at child-row grain. At
    * the 100 TB child side swap the probe to [[SkewJoins]]' bloom
    * semi-join for triage and keep this exact form for the
    * audit-of-record. Union several calls for the FK report.
    */
  def referentialIntegrity(relation: String, child: DataFrame,
      fkCol: String, parent: DataFrame, pkCol: String): DataFrame = {
    val fkAgg = child.groupBy(col(fkCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val pkKeys = parent.select(col(pkCol).as("__k")).distinct()
      .withColumn("__p", lit(1))
    fkAgg.join(pkKeys, Seq("__k"), "full_outer")
      .agg(
        coalesce(sum(col("__c")), lit(0L)).as("__n_child"),
        coalesce(sum(when(col("__k").isNull, col("__c"))), lit(0L))
          .as("__n_null_fk"),
        coalesce(sum(when(col("__k").isNotNull && col("__p").isNull,
          col("__c"))), lit(0L)).as("__n_orphan"),
        sum(when(col("__p").isNotNull, 1L).otherwise(0L))
          .as("__n_parent"),
        sum(when(col("__p").isNotNull && col("__c").isNull, 1L)
          .otherwise(0L)).as("__n_unref"))
      .select(lit(relation).as("relation"),
        col("__n_child").as("n_child"),
        col("__n_null_fk").as("n_null_fk"),
        col("__n_orphan").as("n_orphan_rows"),
        round(col("__n_orphan") / col("__n_child").cast("double"), 6)
          .as("orphan_rate"),
        col("__n_parent").as("n_parent"),
        col("__n_unref").as("n_unreferenced"),
        round(lit(1.0) - col("__n_unref") /
          col("__n_parent").cast("double"), 6).as("coverage"))
  }
}
