package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelScdSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.zipWithIndex
      .map { case ((u, t, at), i) => (i.toLong, u, t, ts(at)) }
      .toDF("event_id", "user_id", "event_type", "ts")
  }

  test("funnel: anchored horizon, strictly-after ordering") {
    // u1 full chain inside horizon; u2 click before view (breaks order);
    // u3 purchase outside the 1h anchor horizon
    val df = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:10:00"),
      (1L, "purchase", "2024-01-01 10:20:00"),
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "view", "2024-01-01 09:30:00"),
      (3L, "view", "2024-01-01 08:00:00"),
      (3L, "click", "2024-01-01 08:30:00"),
      (3L, "purchase", "2024-01-01 09:30:00"))
    val out = Funnel.funnelSummary(df, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"), "1 hour")
      .orderBy(col("step")).collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(3L, 2L, 1L))
    assert(out(2).getAs[Double]("conv_from_first") === 0.3333)
    assert(out(2).getAs[Double]("conv_from_prev") === 0.5)
  }

  test("funnel: same-timestamp step does not count (strictly after)") {
    val df = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"))
    val t = Funnel.funnelTimes(df, "user_id", "event_type", "ts",
      Seq("view", "click"), "1 hour").collect()
    assert(t.length === 1 && t(0).isNullAt(t(0).fieldIndex("t2")))
  }

  test("funnel: horizon boundary is inclusive of anchor+h") {
    val df = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"))
    val t = Funnel.funnelTimes(df, "user_id", "event_type", "ts",
      Seq("view", "click"), "1 hour").collect()
    assert(!t(0).isNullAt(t(0).fieldIndex("t2")))
  }

  test("cohortRetention: cohort by predicate, offsets by calendar week") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // user 1: activates Mon Jan 1 week; active weeks 0 and 2
      (0L, 1L, "purchase", ts("2024-01-02 10:00:00"), 150.0),
      (1L, 1L, "purchase", ts("2024-01-16 10:00:00"), 10.0),
      // user 2: activates week of Jan 8; active week 0 only; the
      // pre-activation purchase on Jan 3 must NOT count (ts < cohort)
      (2L, 2L, "purchase", ts("2024-01-03 10:00:00"), 10.0),
      (3L, 2L, "purchase", ts("2024-01-10 10:00:00"), 200.0),
      // user 3: never activates
      (4L, 3L, "purchase", ts("2024-01-02 10:00:00"), 10.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Funnel.cohortRetention(df, "user_id", "ts",
        col("event_type") === "purchase" && col("value") >= 100,
        col("event_type") === "purchase")
      .orderBy(col("cohort_week"), col("week_offset")).collect()
    val rows = out.map(r => (r.getDate(0).toString,
      r.getInt(1), r.getAs[Long]("n_active"), r.getAs[Double]("retention")))
    assert(rows.toSeq === Seq(
      ("2024-01-01", 0, 1L, 1.0), ("2024-01-01", 2, 1L, 1.0),
      ("2024-01-08", 0, 1L, 1.0)))
  }

  test("scd2: runs collapse, intervals chain, current flagged") {
    val df = ev(
      (1L, "a", "2024-01-01 10:00:00"),
      (1L, "a", "2024-01-01 11:00:00"),
      (1L, "b", "2024-01-01 12:00:00"),
      (1L, "a", "2024-01-01 13:00:00"),
      (2L, "x", "2024-01-01 10:00:00"))
    val out = Scd.intervalize(df, "user_id", "event_type", "ts",
        "event_id")
      .orderBy(col("user_id"), col("effective_from")).collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[String]("event_type")).toSeq === Seq("a", "b", "a"))
    assert(u1.map(_.getAs[Long]("n_obs")).toSeq === Seq(2L, 1L, 1L))
    // each interval closes exactly where the next opens
    assert(u1(0).getAs[Timestamp]("effective_to") ===
      u1(1).getAs[Timestamp]("effective_from"))
    assert(u1(1).getAs[Timestamp]("effective_to") ===
      u1(2).getAs[Timestamp]("effective_from"))
    assert(u1.map(_.getAs[Boolean]("is_current")).toSeq ===
      Seq(false, false, true))
    assert(out.filter(_.getAs[Long]("user_id") == 2L)
      .head.getAs[Boolean]("is_current"))
  }

  test("topEventPaths: counts overlapping windows per user, no " +
      "cross-user stitching, deterministic tie order") {
    val df = ev(
      (1L, "a", "2024-01-01 10:00:00"),
      (1L, "b", "2024-01-01 10:01:00"),
      (1L, "c", "2024-01-01 10:02:00"),
      (1L, "a", "2024-01-01 10:03:00"),
      (2L, "b", "2024-01-01 10:00:00"), // u2's 'b' must not extend u1
      (2L, "c", "2024-01-01 10:01:00"))
    val out = Funnel.topEventPaths(df, "user_id", "event_type", "ts",
        "event_id", n = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_paths"))
    // u1 windows: a>b>c, b>c>a; u2 has only 2 events -> none
    assert(out.toMap === Map("a > b > c" -> 1L, "b > c > a" -> 1L))
  }

  test("conversionLatency: exact minute buckets on the octave grid") {
    // completer converts 90 minutes after anchor -> bucket bitlen(90)=7
    val df = ev(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:30:00"),
      (1L, "purchase", "2024-01-01 11:30:00"),
      // sub-minute completer clamps to 1 minute -> bucket 1
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "click", "2024-01-01 10:00:10"),
      (2L, "purchase", "2024-01-01 10:00:20"),
      (3L, "view", "2024-01-01 10:00:00")) // non-completer: no row
    val out = Funnel.conversionLatency(df, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"), "24 hours")
      .collect().map(r => r.getAs[Int]("bucket") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("min_minutes"))).toMap
    assert(out === Map(7 -> ((1L, 90L)), 1 -> ((1L, 1L))))
  }

  test("scd2: timestamp ties break on the sequence column") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, 7L, "a", ts("2024-01-01 10:00:00")),
      (2L, 7L, "b", ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Scd.intervalize(df, "user_id", "event_type", "ts",
        "event_id").orderBy(col("effective_from"), col("event_type"))
      .collect()
    // two runs, deterministic a-then-b by event_id
    assert(out.map(_.getAs[String]("event_type")).toSeq === Seq("a", "b"))
    assert(out.map(_.getAs[Boolean]("is_current")).toSeq ===
      Seq(false, true))
  }

  test("cohortLtv: cumulative revenue per cohort age, pre-cohort " +
      "spend excluded, ltv divides by cohort size") {
    val s = spark
    import s.implicits._
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    // two users signup in the Mon 2026-01-05 week; one spends 10
    // that week and 6 the next; the other spends 4 in week 1;
    // a pre-signup event (2) must NOT book
    val ev = Seq(
      (1L, ts("2026-01-01 10:00:00"), "purchase", 2.0), // pre-cohort
      (1L, ts("2026-01-06 10:00:00"), "signup", 0.0),
      (1L, ts("2026-01-07 10:00:00"), "purchase", 10.0),
      (1L, ts("2026-01-13 10:00:00"), "purchase", 6.0),
      (2L, ts("2026-01-08 10:00:00"), "signup", 0.0),
      (2L, ts("2026-01-14 10:00:00"), "purchase", 4.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = Funnel.cohortLtv(ev, "user_id", "ts", "value",
        cohortPred = col("event_type") === "signup")
      .orderBy("week_offset").collect()
    assert(out.length === 2)
    val w0 = out(0); val w1 = out(1)
    assert(w0.getAs[Int]("week_offset") === 0)
    assert(w0.getAs[Double]("week_revenue") === 10.0)
    assert(w0.getAs[Long]("cohort_size") === 2L)
    assert(w0.getAs[Double]("ltv_per_user") === 5.0)
    assert(w1.getAs[Double]("week_revenue") === 10.0) // 6 + 4
    assert(w1.getAs[Double]("cum_revenue") === 20.0)
    assert(w1.getAs[Double]("ltv_per_user") === 10.0)
  }
}
