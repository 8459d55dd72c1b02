package graft.operators

import graft.expressions.HashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for corpus construction. Training
  * pipelines need samples that are REPRODUCIBLE (re-running the job or
  * re-reading a partition must keep the same rows — `df.sample()`'s
  * seeded-per-partition RNG does not survive repartitioning) and
  * CONSISTENT across engines (an oracle or a second system must agree
  * row-for-row). Hashing the row id with splitmix64 gives both: the
  * sample is a pure function of the id, so it is stable under retries,
  * shuffles, and engine swaps, and composes with stratification for data
  * mixing (per-source rates — the "sample X% of crawl, keep all of
  * wiki" recipe).
  *
  * Everything is a narrow per-row filter: no shuffle, no state, prunes at
  * the scan when the id is a partition column.
  */
object Sampling {

  private val Buckets = 10000

  /** Stable bucket in [0, 10000) for an id — the one hash both [[sample]]
    * and [[stratifiedSample]] consult, also usable directly for
    * train/validation/test splits (`bucket < 9800` / `< 9900` / rest).
    * `pmod` of the codegen'd [[HashExpressions.splitmix64]]: the whole
    * keep-decision stays inside whole-stage codegen (no UDF boxing per
    * corpus row).
    */
  def hashBucket(id: Column): Column =
    // cast first: splitmix64 hard-rejects non-bigint ids at analysis time
    // (an int or string doc id would throw) — same move as Export.shardOf
    pmod(HashExpressions.splitmix64(id.cast("long")), lit(Buckets.toLong))
      .cast("int")

  /** Keep ~`fraction` of rows, deterministically in the id. */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"bad fraction $fraction")
    // round, don't truncate: 0.29 * 10000 is 2899.999... in binary
    df.filter(hashBucket(col(idCol)) < math.round(fraction * Buckets).toInt)
  }

  /** Per-stratum sampling rates (data mixing): rows in a stratum listed in
    * `fractions` keep that rate; others keep `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(
      lit(math.round(defaultFraction * Buckets).toInt)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k,
        lit(math.round(f * Buckets).toInt)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < threshold)
  }
}
