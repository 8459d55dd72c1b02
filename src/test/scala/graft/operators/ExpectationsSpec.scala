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

  test("referentialIntegrity: orphans, null FKs, and dead parents " +
      "classified at key grain") {
    val s = spark
    import s.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), None, Some(9L),
      Some(9L), Some(9L)).toDF("fk")
    val r = Expectations.referentialIntegrity("child.fk->parent",
      child, "fk", parent, "pk").head()
    assert(r.getAs[Long]("n_child") === 7L)
    assert(r.getAs[Long]("n_null_fk") === 1L)
    assert(r.getAs[Long]("n_orphan_rows") === 3L)
    assert(r.getAs[Double]("orphan_rate") === 0.428571)
    assert(r.getAs[Long]("n_parent") === 3L)
    assert(r.getAs[Long]("n_unreferenced") === 1L) // pk 3 never hit
    assert(r.getAs[Double]("coverage") === 0.666667)
    // a clean edge reads clean
    val clean = Expectations.referentialIntegrity("c",
      Seq(1L, 2L).toDF("fk"), "fk", parent, "pk").head()
    assert(clean.getAs[Long]("n_orphan_rows") === 0L)
    assert(clean.getAs[Double]("orphan_rate") === 0.0)
  }
}
