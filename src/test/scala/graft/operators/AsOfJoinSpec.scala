package graft.operators

import java.sql.Timestamp

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join: backward inclusive semantics, unmatched nulls, the
  * tolerance window, forward direction, and the no-join-node plan
  * shape.
  */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward: latest at-or-before right row per key; ties inclusive; " +
      "no earlier row -> nulls") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:05")),
      (2L, 10L, ts("2026-01-01 10:00:10")), // exact tie with right r2
      (3L, 20L, ts("2026-01-01 09:00:00")), // before any right row
      (4L, 30L, ts("2026-01-01 12:00:00"))  // key with no right rows
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, 10L, ts("2026-01-01 10:00:01")),
      (101L, 10L, ts("2026-01-01 10:00:10")),
      (102L, 20L, ts("2026-01-01 11:00:00"))
    ).toDF("rid", "k", "t")
    val out = AsOfJoin.asOfBackward(left, right, "k", "t",
        rightPayload = Seq("rid", "t"), prefix = "m_")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("m_rid")).map(_.toLong)).toMap
    assert(out === Map(1L -> Some(100L), 2L -> Some(101L),
      3L -> None, 4L -> None))
  }

  test("tolerance nulls matches older than the window") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 1L, ts("2026-01-01 10:10:00"))).toDF("id", "k", "t")
    val right = Seq((9L, 1L, ts("2026-01-01 10:00:00"))).toDF("rid", "k", "t")
    def run(tol: Long) = AsOfJoin.asOfBackward(left, right, "k", "t",
        Seq("rid"), "m_", toleranceMicros = Some(tol))
      .collect().map(r => Option(r.getAs[java.lang.Long]("m_rid"))).head
    assert(run(600L * 1000000) === Some(9L))   // exactly 10 min: inside
    assert(run(599L * 1000000) === None)       // older than 9:59: nulled
  }

  test("forward: earliest at-or-after right row") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00")),
      (2L, 1L, ts("2026-01-01 12:00:01"))
    ).toDF("id", "k", "t")
    val right = Seq(
      (100L, 1L, ts("2026-01-01 11:00:00")),
      (101L, 1L, ts("2026-01-01 12:00:00"))
    ).toDF("rid", "k", "t")
    val out = AsOfJoin.asOfForward(left, right, "k", "t", Seq("rid"), "m_")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("m_rid")).map(_.toLong)).toMap
    assert(out === Map(1L -> Some(100L), 2L -> None))
  }

  test("plan: one keyed shuffle, a window, and NO join node") {
    val s = spark
    import s.implicits._
    val left = (1L to 100L).map(i => (i, i % 7, ts("2026-01-01 10:00:00")))
      .toDF("id", "k", "t")
    val right = (1L to 50L).map(i => (i + 1000, i % 7, ts("2026-01-01 09:00:00")))
      .toDF("rid", "k", "t")
    val df = AsOfJoin.asOfBackward(left, right, "k", "t", Seq("rid"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "as-of must not plan a join:\n" + p)
    assert(p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      "as-of should shuffle each side once into the keyed window:\n" + p)
  }

  test("matches the corpus-scale attribution row count") {
    val q = graft.SparkEntry
      .queries("q141_asof_attribution")(spark, "/root/testdata/sf0.001")
    val rows = q.collect()
    assert(rows.length === 202)
    assert(rows.count(r => !r.isNullAt(r.fieldIndex("click_event_id")))
      === 178)
    // every matched gap is non-negative (at-or-before)
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("micros_since_click"))
      || r.getAs[Long]("micros_since_click") >= 0L))
  }
}
