package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming form of inactivity-gap sessionization
  * ([[graft.operators.Sessionize]]): per-user session state folded
  * over micro-batches with `flatMapGroupsWithState`.
  *
  * State is O(1) per user — last event time, the session ordinal, and
  * the OPEN session's running aggregates (start, count, value) —
  * never the user's events. Each batch emits every session CLOSED in
  * that batch (final rows) plus the current open session's running
  * row (`is_open = true`, re-emitted as it grows); downstream keeps
  * the last row per (user, session_idx), which is well-defined
  * because a session's rows are monotone in `n_events`. Stream ≡
  * batch whenever arrival respects event-time order per user (the
  * funnel-stream contract); late events do not reopen a closed
  * session — they extend or split the open one like any production
  * sessionizer.
  */
object SessionStream {

  case class SEvent(user_id: Long, event_id: Long, ts: Timestamp,
      value: Double)

  case class SState(lastUs: Long, sessionIdx: Long, startUs: Long,
      nEvents: Long, value: Double)

  case class SOut(user_id: Long, session_idx: Long, start_us: Long,
      end_us: Long, n_events: Long, session_value: Double,
      is_open: Boolean)

  /** Fold session state; identical semantics on a batch Dataset
    * (Spark's unified model) — the spec pins stream ≡ batch ≡ the
    * declarative operator.
    */
  def sessionUpdates(events: Dataset[SEvent],
      gapMinutes: Int): Dataset[SOut] = {
    require(gapMinutes > 0, s"bad gap $gapMinutes")
    val gapUs = gapMinutes * 60L * 1000000L
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[SEvent],
            state: GroupState[SState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SOut]
          var st = state.getOption.orNull
          rows.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id))
            .foreach { e =>
              val us = e.ts.getTime * 1000L
              if (st == null) {
                st = SState(us, 1L, us, 1L, e.value)
              } else if (us - st.lastUs > gapUs) {
                // close the open session, open the next
                out += SOut(uid, st.sessionIdx, st.startUs, st.lastUs,
                  st.nEvents, st.value, is_open = false)
                st = SState(us, st.sessionIdx + 1, us, 1L, e.value)
              } else {
                st = SState(us, st.sessionIdx, st.startUs,
                  st.nEvents + 1, st.value + e.value)
              }
            }
          if (st != null) {
            state.update(st)
            out += SOut(uid, st.sessionIdx, st.startUs, st.lastUs,
              st.nEvents, st.value, is_open = true)
          }
          out.iterator
      }
  }
}
