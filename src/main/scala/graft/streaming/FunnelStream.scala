package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming form of the anchored ordered funnel
  * ([[graft.operators.Funnel]]): per-user chain state folded over
  * micro-batches with `mapGroupsWithState`.
  *
  * State is the (anchor, per-step earliest completion) vector — O(k)
  * longs per user, never the user's events. The fold is the greedy
  * form of the batch operator's chained-min computation: processing
  * events in event-time order, the FIRST event that qualifies for step
  * i IS `min(ts | type = step_i, ts > t_{i-1}, ts ≤ anchor + h)`, so
  * stream ≡ batch whenever arrival respects event-time order within
  * each user (the spec feeds ordered chunks and asserts equality, also
  * against [[graft.operators.Funnel.funnelTimes]]). Out-of-order
  * arrival degrades exactly like every production funnel: a step
  * observed before its predecessor does not count retroactively.
  * Emission is Update-mode: one row per touched user per batch with
  * the current reached-step count; state is MONOTONE (times only fill
  * in), so "latest update per user" is well-defined downstream.
  */
object FunnelStream {

  case class FEvent(user_id: Long, event_type: String, ts: Timestamp)

  case class FState(anchor: Long, times: Seq[Long])

  case class FOut(user_id: Long, reached: Int, times: Seq[Long])

  /** Fold funnel chain state; `times(i) = -1` marks an incomplete
    * step. Works identically on a batch Dataset (Spark's unified
    * semantics) — the spec pins batch ≡ stream.
    */
  def funnelUpdates(events: Dataset[FEvent], steps: Seq[String],
      horizonMs: Long): Dataset[FOut] = {
    require(steps.nonEmpty && horizonMs > 0, "need steps and a horizon")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIndex = steps.zipWithIndex.toMap
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[FEvent], state: GroupState[FState]) =>
          var st = state.getOption
            .getOrElse(FState(-1L, Seq.fill(steps.length)(-1L)))
          rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
            stepIndex.get(e.event_type).foreach { i =>
              val t = e.ts.getTime
              val times = st.times
              if (i == 0) {
                if (st.anchor < 0)
                  st = FState(t, times.updated(0, t))
              } else if (st.anchor >= 0 && times(i) < 0 &&
                  times(i - 1) >= 0 && t > times(i - 1) &&
                  t <= st.anchor + horizonMs) {
                st = FState(st.anchor, times.updated(i, t))
              }
            }
          }
          state.update(st)
          FOut(uid, st.times.count(_ >= 0), st.times)
      }
  }
}
