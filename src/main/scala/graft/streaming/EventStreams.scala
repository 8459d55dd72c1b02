package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the `events` stream shape
  * (event_id, user_id, event_type, value, ts, props).
  *
  * The reference is single-shot batch ("late data" ≈ the next run's
  * control file, SURVEY.md §2 gaps note); these operators are the
  * streaming re-expression a continuously-ingesting deployment needs:
  * watermarked windowed aggregation, streaming dedup, and custom session
  * state via flatMapGroupsWithState. Every transform also works on a
  * batch DataFrame (Spark's unified API) — the batch specs assert
  * values, the streaming specs assert them through a MemoryStream.
  */
object EventStreams {

  /** Watermarked hourly counts/sums per event type. Late events beyond
    * the watermark are dropped; state is bounded by watermark retention.
    */
  def hourlyStats(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup on event_id within the watermark horizon —
    * `dropDuplicates` keeps per-key state only until the watermark
    * passes, so state is bounded at scale.
    */
  def dedupedEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class Event(event_id: Long, user_id: Long, event_type: String,
      value: Double, ts: Timestamp)

  case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long)

  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Custom session windows via flatMapGroupsWithState: a session closes
    * after `gapMs` of event-time inactivity, emitting one row per closed
    * session. Event-time timeout (driven by the watermark) keeps the
    * operator deterministic — replaying the same events yields the same
    * sessions, and state per user stays O(1).
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, new Timestamp(s.sessionStart),
              new Timestamp(s.lastTs), s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.sessionStart),
                    new Timestamp(s.lastTs), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
