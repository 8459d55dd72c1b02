package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming ADMISSION form of the per-host cap
  * ([[graft.operators.UrlDedup.capPerHost]]): the crawl frontier
  * cannot re-rank yesterday — it must decide PER ARRIVING PAGE whether
  * the host's budget still has room. State per host is the top-
  * `maxPerHost` (score, id) pairs ADMITTED so far plus one admitted
  * counter — O(maxPerHost) longs, the require-bounded discipline —
  * and a page is admitted iff fewer than `maxPerHost` already-admitted
  * pages of its host beat it (score desc, id asc — the batch cap's
  * exact order).
  *
  * Semantics contract (spec-pinned): on a single batch the admitted
  * set EQUALS the batch cap's keep set (rows fold in (score desc, id)
  * order within a batch). Across batches admission is PREFIX-greedy:
  * an early page admitted under an empty budget STAYS admitted when
  * better pages arrive later (no retraction — the crawl already
  * fetched it), and a later page that still ranks above `maxPerHost`
  * admitted predecessors is admitted too — so the stream admits a
  * SUPERSET of the batch cap's keep set; the periodic corpus rebuild
  * re-runs the batch cap to true it up. A late page beaten by
  * `maxPerHost` admitted pages is refused — the price of never
  * retracting.
  *
  * `flatMapGroupsWithState` in Update mode: one verdict row per
  * arriving page, keyed state per host, no timeout (host budgets do
  * not expire between corpus rebuilds).
  */
object HostCapStream {

  case class HDoc(doc_id: Long, host: String, score: Long,
    ts: Timestamp)

  /** Admitted top-N (score, id) pairs of one host + the admitted
    * count (the capped pair list cannot recover it once admissions
    * pass the cap).
    */
  case class HState(best: Seq[(Long, Long)], nAdmitted: Long)

  case class HOut(doc_id: Long, host: String, score: Long,
    admitted: Boolean, n_admitted_host: Long)

  /** True when (sa, ia) outranks (sb, ib) under the cap's order. */
  private def beats(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa > sb || (sa == sb && ia < ib)

  def admissions(docs: Dataset[HDoc], maxPerHost: Int)
      : Dataset[HOut] = {
    require(maxPerHost >= 1 && maxPerHost <= 100000,
      s"bad maxPerHost $maxPerHost") // state is maxPerHost pairs
    val spark = docs.sparkSession
    import spark.implicits._
    docs.groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (host: String, rows: Iterator[HDoc],
            state: GroupState[HState]) =>
          var st = state.getOption.getOrElse(HState(Seq.empty, 0L))
          val out = rows.toSeq
            .sortBy(d => (-d.score, d.doc_id)) // the batch cap's order
            .map { d =>
              val better = st.best
                .count(b => beats(b._1, b._2, d.score, d.doc_id))
              val admit = better < maxPerHost
              if (admit) {
                st = HState(((d.score, d.doc_id) +: st.best)
                  .sortBy(b => (-b._1, b._2)).take(maxPerHost),
                  st.nAdmitted + 1L)
              }
              HOut(d.doc_id, host, d.score, admit, st.nAdmitted)
            }
          state.update(st)
          out.iterator
      }
  }
}
