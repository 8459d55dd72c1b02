package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inactivity-gap sessionization — the canonical event-stream
  * operator: a user's events split into sessions wherever the gap to
  * the previous event exceeds `gapMinutes` (the "30-minute rule").
  * Composed as ONE keyed window pass: lag for the gap, a running sum
  * of break flags for the session ordinal — never a self-join, never
  * a corpus-grain window. Ties on the timestamp order by `idCol` so
  * the assignment is deterministic and replays in any engine.
  *
  * 100 TB shape: everything shuffles once on the user key; session
  * stats are a second partial-agg on (user, session); the length
  * histogram is bounded by the longest session.
  */
object Sessionize {

  /** Events plus `session_idx` (per-user ordinal, 1-based) and
    * `is_new_session`. The first event of a user always opens session
    * 1; null timestamps are dropped (they have no place on the gap
    * axis).
    */
  def assignSessions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes > 0, s"bad gap $gapMinutes")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val gapMicros = gapMinutes * 60L * 1000000L
    events.filter(col(tsCol).isNotNull)
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(w))
      .withColumn("is_new_session", col("__prev").isNull ||
        unix_micros(col(tsCol)) - col("__prev") > gapMicros)
      .withColumn("session_idx",
        sum(when(col("is_new_session"), 1L).otherwise(0L)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev")
  }

  /** One row per (user, session): bounds, duration, event count,
    * distinct types, value sum (2 dp — the money grid). Integer
    * micros make the duration exact; nothing here is float-order
    * sensitive except the 2-dp value sum (the house events device).
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      gapMinutes: Int = 30): DataFrame =
    assignSessions(events, userCol, tsCol, idCol, gapMinutes)
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        count(lit(1)).as("n_events"),
        countDistinct(col(typeCol)).as("n_types"),
        round(sum(col(valueCol)), 2).as("session_value"))
      .withColumn("duration_s",
        ((col("end_us") - col("start_us")) / 1000000L).cast("long"))

  /** Within-session conversion: per session, did a `convType` event
    * happen at-or-after a `triggerType` event INSIDE the session
    * (integer-micros comparison — ties allowed, same-instant logging
    * counts)? Rolled up by session length: sessions, conversions,
    * rate — the "does engagement depth convert" curve. Same two
    * aggregation passes as [[sessionStats]]; nothing row-grain past
    * the keyed window.
    */
  def sessionConversion(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      triggerType: String, convType: String,
      gapMinutes: Int = 30): DataFrame =
    assignSessions(events, userCol, tsCol, idCol, gapMinutes)
      .groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(when(col(typeCol) === triggerType,
          unix_micros(col(tsCol)))).as("__trig"),
        max(when(col(typeCol) === convType,
          unix_micros(col(tsCol)))).as("__conv"))
      .withColumn("__converted",
        col("__trig").isNotNull && col("__conv").isNotNull &&
          col("__conv") >= col("__trig"))
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__converted"), 1L).otherwise(0L))
          .as("n_converted"))
      .withColumn("conversion_rate", round(
        col("n_converted") / col("n_sessions").cast("double"), 6))

  /** DAU / WAU / stickiness — the engagement dashboard's headline
    * row. Rolling DISTINCT users cannot fold like a sum, so WAU uses
    * the EXPLODE device: each (user, active-day) pair contributes
    * itself to the 7 calendar days it keeps the user "weekly active"
    * for (a bounded ×7 fan-out), and WAU(d) is then a plain
    * count-distinct at day grain — exact, partial-aggregable, no
    * sliding distinct state. Days with no activity simply have no
    * row. Stickiness = DAU/WAU.
    */
  def stickiness(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val days = events.filter(col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        expr(s"unix_micros(${tsCol}) div 86400000000").as("__d"))
      .distinct()
    val dau = days.groupBy(col("__d").as("day"))
      .agg(countDistinct(col("__u")).as("dau"))
    val wau = days
      .select(col("__u"), explode(sequence(col("__d"),
        col("__d") + 6)).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("__u")).as("wau"))
    dau.join(wau, Seq("day"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau").cast("double"), 6)
          .as("stickiness"))
  }

  /** Corpus readout bounded by the longest session: per session
    * LENGTH (event count), how many sessions, mean duration (exact —
    * integer micros summed as longs, divided once), total value, and
    * the bounce share of that length (1 for length 1). The classic
    * engagement curve.
    */
  def sessionLengthProfile(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String, valueCol: String,
      gapMinutes: Int = 30): DataFrame =
    sessionStats(events, userCol, tsCol, idCol, typeCol, valueCol,
      gapMinutes)
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("end_us") - col("start_us")).as("__dur_us"),
        round(sum(col("session_value")), 2).as("total_value"))
      .withColumn("mean_duration_s", round(
        col("__dur_us").cast("double") /
          col("n_sessions").cast("double") / 1000000.0, 4))
      .drop("__dur_us")
}
