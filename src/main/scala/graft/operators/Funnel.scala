package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event stream —
  * the two classic product-analytics shapes, expressed as pure
  * DataFrame algebra so Catalyst keeps every stage an equi-join or a
  * partial-aggregating groupBy.
  *
  * Funnel semantics are FIRST-TOUCH ANCHORED and deterministic: the
  * user's earliest step-1 event opens the (single) conversion window;
  * each later step must be the earliest qualifying event STRICTLY after
  * the previous step and within `horizon` of the anchor. Anchoring at
  * the first step-1 event (rather than searching all anchors) is the
  * common product-analytics convention, and it makes the whole funnel k
  * chained `(user → min ts)` aggregations — one shuffle per step on the
  * user key, no per-user event collection, no window over the whole
  * stream. At 100 TB each stage is a partial-aggregating groupBy of the
  * step's event slice joined to a per-user table that only SHRINKS as
  * the funnel deepens.
  */
object Funnel {

  private def horizonMicros(horizon: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(horizon))
    require(iv.months == 0,
      "funnel horizon must be day-or-finer (months are not fixed-length)")
    val us = iv.days * 86400000000L + iv.microseconds
    require(us > 0, s"funnel horizon must be positive, got '$horizon'")
    us
  }

  /** Per-user step-completion times for an ordered funnel.
    *
    * Returns one row per user that completed at least step 1, with
    * `anchor` (the first step-1 event time) and `t1..tk` (earliest
    * completion time of each step under the strictly-after +
    * within-horizon rule; null once the chain breaks).
    */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], horizon: String): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val us = horizonMicros(horizon)
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("t1"))
      .withColumn("anchor", col("t1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (prev, (step, i)) =>
      // the step slice is filtered BEFORE the join, so each stage only
      // shuffles that step's events against the surviving users
      val stepEvents = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__fn_ts"))
      val next = stepEvents.join(prev, Seq(userCol))
        .filter(unix_micros(col("__fn_ts")) > unix_micros(col(s"t$i")) &&
          unix_micros(col("__fn_ts")) <= unix_micros(col("anchor")) + us)
        .groupBy(col(userCol))
        .agg(min(col("__fn_ts")).as(s"t${i + 1}"))
      prev.join(next, Seq(userCol), "left")
    }
  }

  /** Funnel summary: one row per step with the surviving-user count and
    * conversion rates vs the first step and vs the previous step. The
    * per-step counts are k small aggregates over [[funnelTimes]]'s
    * per-user frame — the union is driver-assembled from STEP NAMES
    * (a config constant), never from data.
    */
  def funnelSummary(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, steps: Seq[String], horizon: String): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps, horizon)
    // one row of k counts feeds k per-step projections — scoped cache
    // so the funnel chain runs once, not once per step
    val countCols = steps.indices.map(i =>
      count(col(s"t${i + 1}")).as(s"n${i + 1}"))
    val counts = graft.CacheScope.register(
      times.agg(countCols.head, countCols.tail: _*).persist())
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      counts.select(lit(i + 1).as("step"), lit(step).as("event_type"),
        col(s"n${i + 1}").as("n_users"),
        round(col(s"n${i + 1}") / col("n1"), 4).as("conv_from_first"),
        round(col(s"n${i + 1}") /
          col(s"n${math.max(i, 1)}"), 4).as("conv_from_prev"))
    }
    stepRows.reduce(_ unionByName _)
  }

  /** Cohort-retention matrix: users enter the cohort of the week of
    * their first event matching `cohortPred`; a cohort member is
    * retained at week-offset k if they have an event matching
    * `activityPred` in that calendar week (weeks are Monday-truncated,
    * offsets exact `datediff / 7` on the truncated dates). Emits one
    * row per (cohort_week, week_offset) with the distinct-user count,
    * the cohort size, and the retention rate.
    *
    * Two shuffles at corpus grain: the per-user first-touch aggregate
    * and the distinct-(user, cohort, offset) aggregate — both partial-
    * aggregating; the final matrix is (weeks × offsets) tiny.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      cohortPred: Column, activityPred: Column): DataFrame = {
    val cohorts = events.filter(cohortPred)
      .groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min(col(tsCol)))).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = events.filter(activityPred)
      .select(col(userCol), col(tsCol).as("__ch_ts"))
      .join(cohorts, Seq(userCol))
      .filter(to_date(col("__ch_ts")) >= col("cohort_week"))
      .select(col(userCol), col("cohort_week"),
        (datediff(to_date(date_trunc("week", col("__ch_ts"))),
          col("cohort_week")) / 7).cast("int").as("week_offset"))
      .distinct()
    active.groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active") / col("cohort_size"), 4).as("retention"))
  }

  /** Cohort LTV curves — [[cohortRetention]]'s money sibling: users
    * cohort by first-event week, every later event's value books to
    * the cohort's week offset, and the cumulative sum along each
    * cohort's age axis divided by cohort size is the
    * lifetime-value-per-user curve finance reads. Weekly revenue
    * rounds to the cent grid BEFORE the cumulation (the house money
    * device), and the running sum is a window KEYED by cohort over
    * the bounded (cohort × offset) table.
    */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, cohortPred: Column): DataFrame = {
    val cohorts = events.filter(cohortPred)
      .groupBy(col(userCol))
      .agg(to_date(date_trunc("week", min(col(tsCol))))
        .as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    val weekly = events
      .select(col(userCol), col(tsCol).as("__lt_ts"),
        col(valueCol).as("__lt_v"))
      .join(cohorts, Seq(userCol))
      .filter(to_date(col("__lt_ts")) >= col("cohort_week"))
      .groupBy(col("cohort_week"),
        (datediff(to_date(date_trunc("week", col("__lt_ts"))),
          col("cohort_week")) / 7).cast("int").as("week_offset"))
      .agg(round(sum(col("__lt_v")), 2).as("week_revenue"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort_week")).orderBy(col("week_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    weekly
      // cumulate EXACT cents, not the cent-grid doubles: a float
      // running sum is engine-order-dependent (Spark folds
      // sequentially, DuckDB's window sum is a segment tree); the
      // integer prefix is order-free and ÷100.0 is one deterministic
      // flop back to currency. Grid contract (same device as
      // q40/q185): floor(x·100 + 0.5) rounds half-UP toward +∞ —
      // for NON-NEGATIVE on-grid revenue it is the identity on
      // cents, but a negative .xx5 off-grid value would round one
      // cent differently than HALF_UP-away-from-zero round(x, 2).
      // This operator's contract is the non-negative 2-decimal
      // grid (week_revenue is a rounded sum of sale prices);
      // refund-negative ledgers would need the sign-symmetric
      // scaler sign(x)·floor(|x|·100 + 0.5) on BOTH engines.
      .withColumn("cum_revenue",
        sum(floor(col("week_revenue") * 100.0 + 0.5).cast("long"))
          .over(w).cast("double") / 100.0)
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"),
        col("week_revenue"), col("cum_revenue"), col("cohort_size"),
        round(col("cum_revenue") / col("cohort_size").cast("double"), 4)
          .as("ltv_per_user"))
  }

  /** Top event paths: the most common length-`n` consecutive
    * event-type sequences per user stream (ordered by ts with a seq
    * tie-break) — "what do people actually do", the behavioral n-gram.
    * One user-key window pass (n−1 leads share the partitioning), one
    * partial-aggregating count, one global top-k heap.
    */
  def topEventPaths(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, seqCol: String, n: Int, k: Int): DataFrame = {
    require(n >= 2 && k >= 1, s"bad path parameters n=$n k=$k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(seqCol))
    val steps = (0 until n).map {
      case 0 => col(typeCol)
      case i => lead(col(typeCol), i).over(w)
    }
    events
      .withColumn("path", concat_ws(" > ", steps: _*))
      .withColumn("__fp_last", steps.last)
      .filter(col("__fp_last").isNotNull)
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(k)
  }

  /** Time-to-convert distribution for funnel completers: octave
    * histogram of (last-step time − anchor) in exact integer MINUTES
    * (pmod-device division, clamped ≥ 1), bucketed by
    * [[Sketches.logBucket]] — the no-doubles bit-length device, so the
    * histogram replays engine-exactly. One row per occupied bucket
    * with the completer count and the bucket's observed min/max.
    */
  def conversionLatency(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, steps: Seq[String],
      horizon: String): DataFrame = {
    val times = funnelTimes(events, userCol, typeCol, tsCol, steps,
      horizon)
    val last = col(s"t${steps.length}")
    val diff = unix_micros(last) - unix_micros(col("anchor"))
    // exact integer minutes via the pmod device (Decay.scala)
    val mins = greatest(
      ((diff - pmod(diff, lit(60000000L))) / lit(60000000L)).cast("long"),
      lit(1L))
    times.filter(last.isNotNull)
      .withColumn("bucket", Sketches.logBucket(mins, maxBits = 24))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_users"),
        min(mins).as("min_minutes"), max(mins).as("max_minutes"))
  }
}
