package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Expectations laws: exact per-rule accounting, NULL counts as a
  * violation, the audit stays one aggregation pass, and violations()
  * tags each failing row with exactly the rules it broke.
  */
class ExpectationsSpec extends SparkSpec {

  private lazy val fixture = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, Some(5), "ok"),
      (2L, Some(-1), "ok"), // breaks positive
      (3L, None, "ok"), // NULL breaks positive (strict)
      (4L, Some(7), "bad"), // breaks domain
      (5L, Some(-2), "bad") // breaks both
    ).toDF("id", "v", "status")
  }

  private val rules = Seq(
    "positive" -> (col("v") > 0),
    "domain" -> (col("status") === "ok"))

  test("audit: exact counts, NULL counts as violation") {
    val out = Expectations.audit(fixture, rules)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"),
          r.getAs[Double]("pass_rate"))).toMap
    assert(out("positive") === ((5L, 3L, 0.4)))
    assert(out("domain") === ((5L, 2L, 0.6)))
  }

  test("violations tags each failing row with exactly its broken rules") {
    val out = Expectations.violations(fixture, rules)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[scala.collection.Seq[String]]("failed_rules").toSet)
      .toMap
    assert(out === Map(
      2L -> Set("positive"), 3L -> Set("positive"),
      4L -> Set("domain"), 5L -> Set("positive", "domain")))
  }

  test("the audit is ONE aggregation pass: a single pair of hash " +
      "aggregates, no join, however many rules") {
    val many = (1 to 12).map(i => s"r$i" -> (col("v") > i))
    val p = Expectations.audit(fixture, many)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p)
    // partial + final of the same one aggregate
    assert("HashAggregate".r.findAllIn(p).size <= 2, p)
  }
}
