package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming CUSUM — the monitoring shape the batch
  * [[graft.operators.Robust.cusumDrift]] diagnoses offline: per-key
  * drift statistics folded over micro-batches with TWO doubles of
  * state (the running prefix sum and its running min — the same
  * telescoped form the batch operator uses, so stream ≡ batch ≡ the
  * literal recurrence under per-key event-time order). The allowance
  * `k` and decision line `h` are FROZEN inputs (calibrated on a
  * reference window), which is exactly how a production monitor runs —
  * the batch form's self-calibration is an offline luxury.
  */
object CusumStream {

  case class Point(key: String, t: Long, x: Double)

  case class CusumState(prefix: Double, minPrefix: Double)

  case class CusumOut(key: String, t: Long, cusum: Double, drift: Boolean)

  /** Update-mode fold: one row per input point (its post-update
    * statistic), points within a batch processed in `t` order.
    */
  def updates(points: Dataset[Point], k: Double,
      h: Double): Dataset[CusumOut] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Point], st: GroupState[CusumState]) =>
          var s = st.getOption.getOrElse(CusumState(0.0, 0.0))
          val out = rows.toSeq.sortBy(_.t).map { p =>
            val prefix = s.prefix + (p.x - k)
            val minp = math.min(s.minPrefix, prefix)
            s = CusumState(prefix, minp)
            val c = prefix - math.min(0.0, minp)
            CusumOut(key, p.t, c, c >= h)
          }
          st.update(s)
          out.iterator
      }
  }

  case class EwmaState(value: Double, initialized: Boolean)

  case class EwmaOut(key: String, t: Long, x: Double, ewma: Double)

  /** Streaming exponentially-weighted moving average — one double of
    * state per key, the literal `s ← α·x + (1−α)·s` recurrence (seeded
    * at the first observation, the standard convention). The smoothed
    * companion the CUSUM monitor reads its level from.
    */
  def ewma(points: Dataset[Point], alpha: Double): Dataset[EwmaOut] = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha out of (0, 1]")
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Point], st: GroupState[EwmaState]) =>
          var s = st.getOption.getOrElse(EwmaState(0.0, false))
          val out = rows.toSeq.sortBy(_.t).map { p =>
            s = if (!s.initialized) EwmaState(p.x, initialized = true)
            else EwmaState(alpha * p.x + (1 - alpha) * s.value, true)
            EwmaOut(key, p.t, p.x, s.value)
          }
          st.update(s)
          out.iterator
      }
  }
}
