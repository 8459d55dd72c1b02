package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 intervalization ([[graft.operators.Scd]] as a fold):
  * per-key state is just the OPEN run (state value, its start, its
  * observation count) — O(1) per key, never the observations — and
  * every state CHANGE emits the closed interval in Append mode. The
  * fold is exactly the batch gaps-and-islands collapse when events
  * arrive in event-time order per key (the spec's chunked-feed
  * equality); the still-open run is not emitted (it has no
  * `effective_to` yet — downstream unions it from state at readout, or
  * waits for the next change).
  */
object ScdStream {

  case class Obs(key: Long, state: String, ts: Timestamp, seq: Long)

  case class RunState(state: String, fromMs: Long, nObs: Long)

  case class ClosedInterval(key: Long, state: String,
      effective_from: Timestamp, effective_to: Timestamp, n_obs: Long)

  def closedIntervals(obs: Dataset[Obs]): Dataset[ClosedInterval] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Obs], st: GroupState[RunState]) =>
          var cur = st.getOption
          val closed = scala.collection.mutable.ArrayBuffer
            .empty[ClosedInterval]
          rows.toSeq.sortBy(o => (o.ts.getTime, o.seq)).foreach { o =>
            val t = o.ts.getTime
            cur match {
              case Some(r) if r.state == o.state =>
                cur = Some(r.copy(nObs = r.nObs + 1))
              case Some(r) =>
                closed += ClosedInterval(key, r.state,
                  new Timestamp(r.fromMs), new Timestamp(t), r.nObs)
                cur = Some(RunState(o.state, t, 1))
              case None =>
                cur = Some(RunState(o.state, t, 1))
            }
          }
          cur.foreach(st.update)
          closed.iterator
      }
  }
}
