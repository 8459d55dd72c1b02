package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Drives the streaming operators through a MemoryStream with multiple
  * triggered batches — watermark advancement, late-event drop, streaming
  * dedup, and session closure are observed, not assumed.
  */
class EventStreamsSpec extends SparkSpec {

  import EventStreams.Event

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("watermarked hourly stats drop events later than the watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.hourlyStats(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append()).start()

    mem.addData(Event(1, 1, "view", 1.0, ts(5)), Event(2, 1, "view", 1.0, ts(20)))
    q.processAllAvailable()
    // advance watermark far past the 10:00 hour, closing its window
    mem.addData(Event(3, 1, "view", 1.0,
      Timestamp.valueOf("2026-01-01 12:30:00")))
    q.processAllAvailable()
    // a late event for the closed hour must be dropped
    mem.addData(Event(4, 1, "view", 99.0, ts(30)))
    q.processAllAvailable()
    q.stop()

    val out = s.sql("SELECT * FROM hourly").collect()
    val tenOClock = out.filter(_.getAs[Timestamp]("hour_start") ==
      Timestamp.valueOf("2026-01-01 10:00:00"))
    assert(tenOClock.length === 1)
    assert(tenOClock.head.getAs[Long]("n") === 2) // late event 4 dropped
  }

  test("streaming dedup keeps first occurrence per event_id") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupedEvents(mem.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Event(1, 1, "view", 1.0, ts(0)),
      Event(1, 1, "view", 1.0, ts(1)), Event(2, 1, "click", 1.0, ts(2)))
    q.processAllAvailable()
    mem.addData(Event(2, 1, "click", 1.0, ts(3)), Event(3, 2, "view", 1.0, ts(4)))
    q.processAllAvailable()
    q.stop()
    assert(s.sql("SELECT event_id FROM deduped").collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("flatMapGroupsWithState sessionizer closes sessions on gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 5 min apart (one session), then a 40-min gap
    // within the same micro-batch sequence → first session closes in-line
    mem.addData(Event(1, 1, "view", 1.0, ts(0)), Event(2, 1, "view", 1.0, ts(5)))
    q.processAllAvailable()
    mem.addData(Event(3, 1, "view", 1.0, ts(45)))
    q.processAllAvailable()
    val afterGap = s.sql("SELECT * FROM sessions").collect()
    assert(afterGap.length === 1)
    assert(afterGap.head.getAs[Long]("n_events") === 2)
    assert(afterGap.head.getAs[Timestamp]("session_start") === ts(0))
    assert(afterGap.head.getAs[Timestamp]("session_end") === ts(5))

    // advance the watermark far past user 1's open session, then trigger
    // one more batch so the event-time timeout fires and closes it
    mem.addData(Event(4, 2, "view", 1.0,
      Timestamp.valueOf("2026-01-01 12:00:00")))
    q.processAllAvailable()
    mem.addData(Event(5, 2, "view", 1.0,
      Timestamp.valueOf("2026-01-01 12:01:00")))
    q.processAllAvailable()
    q.stop()

    val closed = s.sql("SELECT * FROM sessions WHERE user_id = 1").collect()
    assert(closed.length === 2)
    val second = closed.filter(_.getAs[Timestamp]("session_start") == ts(45))
    assert(second.length === 1 && second.head.getAs[Long]("n_events") === 1)
  }
}
