package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming transition extraction — the incremental feed for
  * [[graft.operators.Markov]]: one state value per key (the LAST seen
  * state) carried across micro-batches, each arriving event emitting
  * exactly the (from, to) pair the batch lead-window would produce.
  * Fold the emitted pairs with a plain `groupBy(from_state, to_state)
  * .count()` (update-mode agg or foreachBatch) and the counts are
  * IDENTICAL to [[graft.operators.Markov.transitionMatrix]]'s `n` —
  * the spec pins that identity. State is O(1) per key; rows within a
  * batch are processed in (t, tie) order, so the batch boundary is
  * invisible (the append-log contract).
  */
object MarkovStream {

  case class Ev(key: Long, t: Long, tie: Long, state: String)

  case class LastState(state: String)

  case class Transition(key: Long, t: Long, from_state: String,
      to_state: String)

  def transitions(events: Dataset[Ev]): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Ev], st: GroupState[LastState]) =>
          var prev = st.getOption.map(_.state)
          val out = rows.toSeq.sortBy(e => (e.t, e.tie)).flatMap { e =>
            val emitted = prev.map(p =>
              Transition(key, e.t, p, e.state))
            prev = Some(e.state)
            emitted
          }
          prev.foreach(p => st.update(LastState(p)))
          out.iterator
      }
  }
}
