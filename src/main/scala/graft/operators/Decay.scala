package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponential time-decay weighting — the "recent data matters more"
  * primitive behind freshness-weighted source mixing and decayed
  * engagement counters.
  *
  * The weight is HALF-LIFE BUCKETED: `w = 2^(-floor(age / halfLife))`,
  * i.e. events in the most recent half-life window count 1.0, the next
  * window 0.5, and so on. Bucketing (rather than the continuous
  * `2^(-age/halfLife)`) is deliberate: the exponent stays an INTEGER,
  * so `power(2.0, -n)` is an exactly-representable double on every
  * engine and the weighted sums replay bit-for-bit in the DuckDB oracle
  * — the same device the HLL estimator uses for its register sum. A
  * continuous `pow(0.5, age/hl)` leans on each libm's (non-guaranteed)
  * pow rounding. The age is integer microseconds and the bucket an
  * integer `div` — no doubles until the weight itself.
  */
object Decay {

  /** Bucketed decay weight for a timestamp column against a reference
    * timestamp column/literal: `2^(-floor((ref - ts) / halfLife))`.
    * Rows AFTER the reference (negative age) clamp to bucket 0
    * (weight 1.0) — a late-arriving event is "now", not the future.
    */
  def decayWeight(ts: Column, ref: Column, halfLife: String): Column = {
    val hlUs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String
        .fromString(halfLife))
    require(hlUs.months == 0,
      "half-life must be day-or-finer (months are not fixed-length)")
    val us = hlUs.days * 86400000000L + hlUs.microseconds
    require(us > 0, s"half-life must be positive, got '$halfLife'")
    val age = greatest(unix_micros(ref) - unix_micros(ts), lit(0L))
    // exact long division: subtracting the pmod makes the numerator an
    // exact multiple, so the double divide returns the integer quotient
    // exactly (no floor-of-inexact-ratio boundary risk)
    val bucket = ((age - pmod(age, lit(us))) / lit(us)).cast("long")
    pow(lit(2.0), -bucket.cast("double"))
  }

  /** Per-group decayed activity profile against the stream's own max
    * timestamp: raw count, decayed count (the "freshness-weighted
    * volume"), and the decayed sum of `valueCol`. One scalar max, one
    * partial-aggregating groupBy — no row-grain shuffle.
    */
  def decayedProfile(df: DataFrame, groupCol: String, tsCol: String,
      valueCol: String, halfLife: String): DataFrame = {
    val ref = df.select(max(col(tsCol)).as("__dc_ref"))
    df.crossJoin(broadcast(ref))
      .withColumn("__dc_w",
        decayWeight(col(tsCol), col("__dc_ref"), halfLife))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("__dc_w")), 4).as("decayed_count"),
        round(sum(col(valueCol) * col("__dc_w")), 4).as("decayed_value"))
  }
}
