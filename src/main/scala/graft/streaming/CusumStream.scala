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

  case class PhState(n: Double, sum: Double, m: Double, minM: Double,
    ph: Double, alarmT: Double)

  case class PhOut(key: String, t: Long, n: Long, mean: Double,
    ph: Double, drift: Boolean, tAlarm: Option[Long])

  /** Streaming Page–Hinkley — the batch
    * [[graft.operators.Robust.pageHinkley]] fold run as per-key O(1)
    * state over micro-batches: six doubles per key, the identical
    * per-step arithmetic INCLUDING the 1e-6 grid snap on `m`
    * ([[graft.functions.Grid.snapD]] is the same IEEE program as the
    * batch aggregate's snapSql), so stream ≡ batch at every prefix
    * under per-key event-time order. Emits one row per point (its
    * post-update statistic); the final row per key equals the batch
    * operator's output row.
    */
  def pageHinkley(points: Dataset[Point], delta: Double,
      lambda: Double): Dataset[PhOut] = {
    require(lambda > 0, s"bad lambda $lambda")
    import graft.functions.Grid.snapD
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[Point], st: GroupState[PhState]) =>
          var s = st.getOption.getOrElse(
            PhState(0.0, 0.0, 0.0, 0.0, 0.0, -1.0))
          val out = rows.toSeq.sortBy(_.t).map { p =>
            val n1 = s.n + 1.0
            val s1 = s.sum + p.x
            val m1 = snapD(s.m + (p.x - s1 / n1 - delta))
            val mn1 = math.min(s.minM, m1)
            val exc = snapD(m1 - mn1)
            val ph1 = math.max(s.ph, exc)
            val at1 =
              if (s.alarmT >= 0.0) s.alarmT
              else if (exc > lambda) p.t.toDouble
              else -1.0
            s = PhState(n1, s1, m1, mn1, ph1, at1)
            PhOut(key, p.t, n1.toLong, snapD(s1 / n1, 4),
              snapD(ph1, 4), ph1 > lambda,
              if (at1 >= 0.0) Some(at1.toLong) else None)
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
