package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** PII profiler laws: a column OF a PII type flags (rate > .5), text
  * that merely mentions one doesn't, nulls stay out of the rate
  * denominator, and scrub redacts exactly the profiled matches with
  * a correct per-row count.
  */
class PiiProfileSpec extends SparkSpec {

  private val fixture = Seq(
    (1L, "alice@example.com", "call 33-123-456-7890 today"),
    (2L, "bob.smith+x@sub.domain.org", "nothing here"),
    (3L, "not-an-email", "server at 10.0.255.3 port 80"),
    (4L, null.asInstanceOf[String], "account 123456789 overdue"))

  test("profile: the email column flags email (3/4 non-null rows " +
      "match 2), free text matches phone/ipv4/digit_run without " +
      "flagging, nulls excluded from denominators") {
    val s = spark
    import s.implicits._
    val df = fixture.toDF("id", "contact", "note")
    val out = PiiProfile.profile(df, Seq("contact", "note"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_nonnull"), r.getAs[Long]("n_match"),
          r.getAs[Boolean]("flagged"))).toMap
    assert(out(("contact", "email")) === ((3L, 2L, true)))
    assert(out(("contact", "phone"))._2 === 0L)
    assert(out(("note", "phone")) === ((4L, 1L, false)))
    assert(out(("note", "ipv4")) === ((4L, 1L, false)))
    assert(out(("note", "digit_run")) === ((4L, 1L, false)))
    assert(out(("note", "email"))._2 === 0L)
    // n_rows counts every row; n_nonnull only the present values
    val contact = PiiProfile.profile(df, Seq("contact"))
      .filter(col("pattern") === "email").head()
    assert(contact.getAs[Long]("n_rows") === 4L)
    assert(contact.getAs[Long]("n_nonnull") === 3L)
    assert(math.abs(contact.getAs[Double]("match_rate") - 2.0 / 3)
      < 1e-6)
  }

  test("scrub: matches redact to their tags, n_redactions counts all " +
      "patterns, clean rows pass through untouched") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "mail alice@example.com or 10.0.0.1 now"),
      (2L, "clean text")).toDF("id", "text")
    val out = PiiProfile.scrub(df, "text")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("text") === "mail <email> or <ipv4> now")
    assert(out(0).getAs[Long]("n_redactions") === 2L)
    assert(out(1).getAs[String]("text") === "clean text")
    assert(out(1).getAs[Long]("n_redactions") === 0L)
  }
}
