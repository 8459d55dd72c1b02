package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — the retention/churn curve with
  * CORRECT censoring handling (Kaplan & Meier 1958). Naive retention
  * ("fraction still active at day t", q155) silently treats every
  * not-yet-churned subject as churned at the observation horizon; KM
  * instead removes censored subjects from the at-risk set at their
  * censoring time, which is the standard estimator for "how long do
  * users stay" on a window of data that ends before everyone's story
  * does.
  *
  * Estimator: at each distinct duration t where ≥ 1 event occurred,
  * with `n_t` = subjects whose duration ≥ t (at risk) and `d_t` =
  * events at exactly t, the survival is `S(t) = Π_{u ≤ t} (1 − d_u/n_u)`.
  *
  * Scale shape: one aggregation to the (group, duration) grain — the
  * curve table is BOUNDED by distinct durations per group, not by
  * subjects — then windows over that bounded table only (risk sets via
  * a reverse cumulative sum, the product via exp∘sum∘ln). The corpus
  * pays one partial-agg shuffle; no window ever runs at subject grain.
  *
  * Portability: n and d are exact integers; the product is evaluated
  * as `exp(Σ⌊ln(1 − d/n)·1e9 + ½⌋ / 1e9)` — each log factor snapped to
  * the 1e-9 grid (libm ulp differences are ~1e-15 per term), then an
  * EXACT integer cumulative sum, which is order-free. Ordering a float
  * sum does not make it portable: Spark folds sequentially while
  * DuckDB's window sum is a pairwise segment tree.
  *
  * Grid accuracy bound: each term carries ≤ 5e-10 quantization bias,
  * so over T distinct event times the summed drift is ≤ T·5e-10 —
  * the 4-dp rounded survival readout is exact for any T below ~10^5
  * (the 1e-6 grid this replaced drifted at T·5e-7, which could flip
  * the readout for curves past T ≈ 200). Domain: |ln factor| ≤
  * ln(n_risk) ≤ ~45, so the scaled term stays far below 2^53 and a
  * cumulative long sum holds past 10^8 event times.
  */
object Survival {

  /** KM curve per group. Input: one row per SUBJECT with a non-negative
    * integer-ish `durationCol` and `eventCol` ∈ {true = event observed
    * (churned/died), false = censored (still active at horizon)}.
    * Output: (group, t, n_risk, n_events, n_censored, survival), one
    * row per (group, duration-with-events), survival rounded 4 dp.
    *
    * Censored subjects still reduce later risk sets (rows with only
    * censoring appear in no output row but their mass leaves `n_risk`
    * through the cumulative removal term — the whole point of KM).
    */
  def kaplanMeier(subjects: DataFrame, groupCol: String,
      durationCol: String, eventCol: String): DataFrame = {
    val byDur = subjects
      .groupBy(col(groupCol), col(durationCol).cast("long").as("t"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("n_events"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("n_censored"))
    val totals = byDur.groupBy(col(groupCol))
      .agg(sum(col("n_events") + col("n_censored")).as("__tot"))
    val wPrior = Window.partitionBy(col(groupCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col(groupCol)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur
      .join(totals, Seq(groupCol))
      .withColumn("n_risk",
        col("__tot") - coalesce(
          sum(col("n_events") + col("n_censored")).over(wPrior), lit(0L)))
      // survival factors exist at every duration row, but only rows
      // with events move the curve (ln(1-0/n) = 0 contributes nothing,
      // so computing the cumsum BEFORE dropping event-free rows is
      // equivalent and keeps the window over the same bounded table).
      // The d = n row (everyone at risk dies) makes its factor 0 and
      // the curve 0 FOREVER — guarded explicitly because ln(0) is null
      // in Spark (silently dropped from the sum) and -inf elsewhere:
      // the zero absorbs, it must never pass through the log path.
      .withColumn("__lnf",
        when(col("n_events") < col("n_risk"),
          log(lit(1.0) - col("n_events").cast("double") / col("n_risk")))
          .otherwise(lit(0.0)))
      // each ln factor snaps to the 1e-9 grid and the cumulative sum
      // runs over EXACT integers — order-free, where a float window
      // sum is engine-tree-dependent (Spark sequential, DuckDB
      // segment tree); exp of the one grid quotient is deterministic
      .withColumn("__lnsc", floor(col("__lnf") * 1e9 + 0.5).cast("long"))
      .withColumn("__hit0",
        max(when(col("n_events") >= col("n_risk"), 1).otherwise(0))
          .over(wCum))
      .withColumn("survival",
        when(col("__hit0") === 1, lit(0.0))
          .otherwise(round(exp(
            sum(col("__lnsc")).over(wCum).cast("double") / 1e9), 4)))
      .filter(col("n_events") > 0)
      .select(col(groupCol), col("t"), col("n_risk"), col("n_events"),
        col("n_censored"), col("survival"))
  }

  /** Two-arm log-rank test (Mantel 1966) — "are these two survival
    * curves the same?", the hypothesis test that completes the
    * [[kaplanMeier]] readout for experimentation (per-arm KM curves
    * say WHAT the curves look like; log-rank says whether the
    * difference is noise). Arms must be EXACTLY two (the
    * [[Abtest.welchTTest]] house rule — a silent first-two pick is a
    * wrong answer).
    *
    * At each pooled event time t: `n_at` at risk per arm, `d_t` total
    * events, expected arm-a events `E = d_t·n_at/n_t`, hypergeometric
    * variance `V = d_t·(n_a/n_t)·(n_b/n_t)·(n_t−d_t)/(n_t−1)`;
    * `z = Σ(d_at − E)/√ΣV`, `chi2 = z²` (df 1). Risk sets come from
    * the same bounded-curve-table device as [[kaplanMeier]]: one
    * corpus-grain aggregation to (arm, t), then a 2×distinct-durations
    * grid carries cumulative removals — no window ever runs at subject
    * grain. The float sums (E, V) total as EXACT 1e-9-grid integers
    * (each term floor(x·1e9 + 0.5), then plain integer sums — ordering
    * a float sum does NOT make it portable: engines accumulate in
    * different trees); integer sums are exact by nature. Grid bias is
    * ≤ 5e-10 per distinct event time (the 1e-6 grid this replaced
    * drifted at T·5e-7 — enough to flip the 4-dp z past T ≈ 200).
    * Domain bounds of the 1e-9 device: per-term exactness needs
    * d_t < 9·10^6 events at any SINGLE distinct time (|E|,|V| ≤ d_t
    * and x·10^9 must stay below 2^53); the long totals hold while
    * total events < 9·10^9.
    *
    * Output: one row `(arm_a, arm_b, n_a, n_b, o_a, o_b, e_a, z,
    * chi2)` — subjects, observed events, expected arm-a events,
    * rounded 4 dp. A degenerate design with zero variance (no time
    * has both arms at risk with an event) yields null z/chi2.
    */
  def logRank(subjects: DataFrame, groupCol: String,
      durationCol: String, eventCol: String): DataFrame = {
    val spark = subjects.sparkSession
    import spark.implicits._
    val arms = subjects.select(col(groupCol).cast("string"))
      .distinct().collect().map(_.getString(0)).sorted
    require(arms.length == 2,
      s"logRank needs exactly 2 arms, got ${arms.toSeq}")
    val Seq(armA, armB) = arms.toSeq
    // a null duration has no place on the time axis — dropped here
    // explicitly (the subject builders never emit one; raw caller
    // frames might, and a null-keyed grid row would poison every
    // later risk set through the cumulative-removal window)
    val byDur = subjects
      .filter(col(durationCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("arm"),
        col(durationCol).cast("long").as("t"))
      .agg(sum(when(col(eventCol), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("rm"))
    val tots = byDur.groupBy(col("arm")).agg(sum(col("rm")).as("tot"))
    // grid = every distinct removal time × both arms (bounded: 2 ×
    // distinct durations), so cumulative removals see censor-only
    // times an arm has no event at
    val grid = byDur.select(col("t")).distinct()
      .crossJoin(broadcast(Seq(armA, armB).toDF("arm")))
    val wPrior = Window.partitionBy(col("arm")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val filled = grid
      .join(byDur, Seq("arm", "t"), "left")
      .na.fill(0L, Seq("d", "rm"))
      .join(tots, Seq("arm"))
      .withColumn("n_risk", col("tot") -
        coalesce(sum(col("rm")).over(wPrior), lit(0L)))
    val byT = filled.groupBy(col("t"))
      .agg(sum(when(col("arm") === armA, col("d"))).as("d_a"),
        sum(when(col("arm") === armB, col("d"))).as("d_b"),
        sum(when(col("arm") === armA, col("n_risk"))).as("n_a"),
        sum(when(col("arm") === armB, col("n_risk"))).as("n_b"))
      .withColumn("d_t", col("d_a") + col("d_b"))
      .withColumn("n_t", col("n_a") + col("n_b"))
      .filter(col("d_t") > 0 && col("n_t") > 1)
      .withColumn("e_a",
        col("d_t").cast("double") * col("n_a") / col("n_t"))
      .withColumn("v",
        col("d_t").cast("double") * col("n_a") / col("n_t")
          * col("n_b") / col("n_t")
          * (col("n_t") - col("d_t")) / (col("n_t") - lit(1L)))
    // ΣE and ΣV as EXACT 1e-9-grid integers: each per-t term snaps to
    // the fine grid (floor(x·1e9 + 0.5) — engine-portable within a
    // libm ulp) and the totals are plain integer sums, order-free on
    // any engine and any plan. A float running sum read at the last
    // row is NOT portable even with both engines ordering by t: Spark
    // folds sequentially but DuckDB's window sum is a pairwise segment
    // tree (the q254 divergence class). This also drops the
    // single-task ordered scan — one unordered aggregate over the
    // bounded term table.
    val sums = byT.agg(
        sum(col("d_a")).as("__oa"), sum(col("d_b")).as("__ob"),
        sum(floor(col("e_a") * 1e9 + 0.5).cast("long")).as("__easc"),
        sum(floor(col("v") * 1e9 + 0.5).cast("long")).as("__vsc"))
      .filter(col("__oa").isNotNull) // empty term table → empty output
      .withColumn("__ea", col("__easc").cast("double") / 1e9)
      .withColumn("__v", col("__vsc").cast("double") / 1e9)
    sums
      .join(broadcast(tots.groupBy()
        .agg(sum(when(col("arm") === armA, col("tot"))).as("n_a_tot"),
          sum(when(col("arm") === armB, col("tot"))).as("n_b_tot"))))
      .select(lit(armA).as("arm_a"), lit(armB).as("arm_b"),
        col("n_a_tot").as("n_a"), col("n_b_tot").as("n_b"),
        col("__oa").as("o_a"), col("__ob").as("o_b"),
        round(col("__ea"), 4).as("e_a"),
        when(col("__v") > 0, round(
          (col("__oa") - col("__ea")) / sqrt(col("__v")), 4)).as("z"),
        when(col("__v") > 0, round(
          (col("__oa") - col("__ea")) * (col("__oa") - col("__ea"))
            / col("__v"), 4)).as("chi2"))
  }

  /** Subject table for time-to-conversion under an ADMINISTRATIVE
    * censoring window: duration = days from the subject's first event
    * to its first conversion event; subjects not converting within
    * `windowDays` are censored AT the window (duration = windowDays,
    * event = false). This is the "W-day conversion" product metric in
    * its statistically honest form — late converters are censored, not
    * counted as failures at the horizon.
    */
  def conversionSubjects(events: DataFrame, subjectCol: String,
      tsCol: String, orderCol: String, segment: Column,
      isConversion: Column, windowDays: Int): DataFrame = {
    val w = Window.partitionBy(col(subjectCol))
      .orderBy(col(tsCol), col(orderCol))
    val perUser = events
      .withColumn("__seg", segment)
      .withColumn("__conv", isConversion)
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(subjectCol))
      .agg(min(col(tsCol)).as("__t0"),
        max(col(tsCol)).as("__tl"),
        min(when(col("__conv"), col(tsCol))).as("__tc"),
        max(when(col("__rn") === 1, col("__seg"))).as("segment"))
    // Corpus horizon (max ts anywhere, as the day grid) — a subject
    // that entered fewer than windowDays before the data edge has NOT
    // been observed for the full window, so censoring it at windowDays
    // would overstate follow-up and inflate the late at-risk sets.
    // Non-converters censor at min(windowDays, observed days) instead.
    // One bounded driver fact, same device as activitySubjects.
    val horizonDate = perUser
      .agg(max(col("__tl").cast("date"))).head().getDate(0)
    perUser
      .withColumn("__dur",
        datediff(col("__tc").cast("date"), col("__t0").cast("date"))
          .cast("long"))
      .withColumn("__obs",
        datediff(lit(horizonDate), col("__t0").cast("date"))
          .cast("long"))
      .withColumn("converted",
        col("__dur").isNotNull && col("__dur") <= windowDays)
      .withColumn("duration_days",
        when(col("converted"), col("__dur"))
          .otherwise(least(lit(windowDays.toLong), col("__obs"))))
      .select(col(subjectCol), col("segment"), col("duration_days"),
        col("converted"))
  }

  /** Subject table for activity churn: per subject, duration = days
    * from first to last event; the subject is CHURNED (event = true)
    * when its last activity is more than `inactiveDays` before the
    * corpus horizon (max ts anywhere), else censored. `segment` is any
    * per-subject label expression evaluated on the subject's FIRST
    * event row ((ts, orderCol) order — deterministic).
    */
  def activitySubjects(events: DataFrame, subjectCol: String,
      tsCol: String, orderCol: String, segment: Column,
      inactiveDays: Int): DataFrame = {
    val w = Window.partitionBy(col(subjectCol))
      .orderBy(col(tsCol), col(orderCol))
    val perUser = events
      .withColumn("__seg", segment)
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(subjectCol))
      .agg(min(col(tsCol)).as("__t0"), max(col(tsCol)).as("__tl"),
        max(when(col("__rn") === 1, col("__seg"))).as("segment"))
    // horizon as exact integer MICROS (a millisecond round-trip through
    // java.time would truncate the sub-ms components real event data
    // carries) — one bounded driver fact
    val horizonMicros = perUser
      .agg(max(unix_micros(col("__tl")))).head().getLong(0)
    perUser
      .withColumn("duration_days",
        datediff(col("__tl").cast("date"), col("__t0").cast("date"))
          .cast("long"))
      .withColumn("churned",
        unix_micros(col("__tl")) <
          lit(horizonMicros - inactiveDays.toLong * 86400000000L))
      .select(col(subjectCol), col("segment"), col("duration_days"),
        col("churned"))
  }
}
