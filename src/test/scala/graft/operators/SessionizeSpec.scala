package graft.operators

import java.sql.Timestamp

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization: break rule, ordinals, stats, the
  * length profile, tie determinism, null handling.
  */
class SessionizeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("assignSessions: 30-minute rule, per-user ordinals, first " +
      "event opens session 1") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),
      (1L, 11L, ts("2026-01-01 10:10:00")), // 10m gap: same session
      (1L, 12L, ts("2026-01-01 10:50:00")), // 40m gap: new session
      (1L, 13L, ts("2026-01-01 10:51:00")),
      (2L, 20L, ts("2026-01-01 09:00:00"))  // lone event
    ).toDF("user_id", "event_id", "ts")
    val out = Sessionize.assignSessions(ev, "user_id", "ts",
        "event_id", gapMinutes = 30)
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 2L,
      20L -> 1L))
  }

  test("sessionStats + length profile: durations exact, bounces " +
      "counted, null ts dropped") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 10L, Some(ts("2026-01-01 10:00:00")), "view", 1.0),
      (1L, 11L, Some(ts("2026-01-01 10:10:00")), "click", 2.0),
      (1L, 12L, Some(ts("2026-01-01 10:50:00")), "view", 3.0),
      (1L, 13L, Some(ts("2026-01-01 10:51:00")), "view", 4.0),
      (2L, 20L, Some(ts("2026-01-01 09:00:00")), "view", 5.0),
      (3L, 30L, Option.empty[Timestamp], "view", 9.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val st = Sessionize.sessionStats(ev, "user_id", "ts", "event_id",
        "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("duration_s"), r.getAs[Long]("n_events"),
          r.getAs[Long]("n_types"), r.getAs[Double]("session_value"))))
      .toMap
    assert(st((1L, 1L)) === ((600L, 2L, 2L, 3.0)))
    assert(st((1L, 2L)) === ((60L, 2L, 1L, 7.0)))
    assert(st((2L, 1L)) === ((0L, 1L, 1L, 5.0)))
    assert(!st.contains((3L, 1L)), "null ts must drop")
    val prof = Sessionize.sessionLengthProfile(ev, "user_id", "ts",
        "event_id", "event_type", "value")
      .collect().map(r => r.getAs[Long]("n_events") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Double]("total_value"),
          r.getAs[Double]("mean_duration_s")))).toMap
    assert(prof(1L) === ((1L, 5.0, 0.0)))       // the bounce bucket
    assert(prof(2L) === ((2L, 10.0, 330.0)))    // (600+60)/2
  }

  test("sessionConversion: trigger must precede (or tie) conversion " +
      "INSIDE the session; cross-session pairs never count") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // u1 session 1: view -> purchase  => converted
      (1L, 10L, ts("2026-01-01 10:00:00"), "view"),
      (1L, 11L, ts("2026-01-01 10:05:00"), "purchase"),
      // u1 session 2: purchase BEFORE view => not converted
      (1L, 12L, ts("2026-01-01 12:00:00"), "purchase"),
      (1L, 13L, ts("2026-01-01 12:01:00"), "view"),
      // u2: view in one session, purchase in the NEXT => neither
      (2L, 20L, ts("2026-01-01 09:00:00"), "view"),
      (2L, 21L, ts("2026-01-01 11:00:00"), "purchase"),
      // u3: same-instant view+purchase ties => converted
      (3L, 30L, ts("2026-01-01 08:00:00"), "view"),
      (3L, 31L, ts("2026-01-01 08:00:00"), "purchase")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Sessionize.sessionConversion(ev, "user_id", "ts",
        "event_id", "event_type", "view", "purchase", gapMinutes = 30)
      .collect().map(r => r.getAs[Long]("n_events") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_converted"))))
      .toMap
    // 2-event sessions: u1s1 (conv), u1s2 (no), u3 (conv) -> 3/2
    assert(out(2L) === ((3L, 2L)))
    // 1-event sessions: u2's two singletons, no conversion
    assert(out(1L) === ((2L, 0L)))
  }

  test("stickiness: WAU looks back 7 calendar days via the explode " +
      "device; DAU/WAU exact") {
    val s = spark
    import s.implicits._
    def at(day: Int) = new Timestamp(day * 86400000L + 1000L)
    val ev = Seq((1L, at(0)), (1L, at(3)), (2L, at(0)))
      .toDF("user_id", "ts")
    val out = Sessionize.stickiness(ev, "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("stickiness"))))
      .toMap
    // only days WITH activity have rows
    assert(out.keySet === Set(0L, 3L))
    assert(out(0L) === ((2L, 2L, 1.0)))
    // day 3: DAU {u1}; WAU covers day-0 activity too -> {u1, u2}
    assert(out(3L) === ((1L, 2L, 0.5)))
  }

  test("equal timestamps order by the id column: assignment is " +
      "deterministic under repartition") {
    val s = spark
    import s.implicits._
    val t0 = ts("2026-01-01 10:00:00")
    val ev = (1 to 40).map(i => (7L, i.toLong, t0)).toDF(
      "user_id", "event_id", "ts")
    val a = Sessionize.assignSessions(ev, "user_id", "ts", "event_id")
      .select("event_id", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Sessionize.assignSessions(ev.repartition(13), "user_id",
        "ts", "event_id")
      .select("event_id", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
    assert(a.forall(_._2 === 1L), "zero gaps: one session")
  }
}
