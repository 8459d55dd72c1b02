package graft.operators

import graft.expressions.HashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals — the resampling scheme that
  * actually works on distributed data. The classic bootstrap draws n
  * rows WITH replacement per replicate, which needs a global sample; the
  * Poisson approximation gives every (row, replicate) an independent
  * Poisson(1) multiplicity instead, so all R replicates materialize in
  * ONE map-side explode and aggregate in ONE shuffle at
  * (group × replicate) grain — the standard trick for bootstrap at
  * cluster scale.
  *
  * Determinism: the multiplicity is the Poisson(1) inverse CDF applied
  * to the exact-double 53-bit uniform
  * `u = ((splitmix64(splitmix64(id) XOR rep) >>> 11) + 0.5) · 2⁻⁵³`
  * (the q67 double-mix composed with the q119 uniform construction), so
  * a second engine replays every weight — and therefore every replicate
  * mean — bit-for-bit. The CDF cut points are double literals shared
  * with the oracle via round-trip printing.
  */
object Bootstrap {

  /** Cumulative Poisson(1) probabilities c₀..c₅ (`P(X ≤ k) = e⁻¹ Σ 1/j!`);
    * u ≥ c₅ caps the multiplicity at 6 (P ≈ 6e-5 — the tail beyond is
    * below the 2⁻⁵³ uniform grid's ability to matter for means).
    */
  val CumPoisson1: Seq[Double] = {
    val e = math.exp(-1.0)
    Seq.iterate((e, 1.0, 0), 6) { case (cum, fact, k) =>
      val f = fact * (k + 1)
      (cum + e / f, f, k + 1)
    }.map(_._1)
  }

  /** The exact 53-bit uniform of the (id, rep) pair — q67's double mix
    * feeding q119's `((z >>> 11) + 0.5) · 2⁻⁵³` construction.
    */
  def pairUniform(id: Column, rep: Column): Column = {
    val z = HashExpressions.splitmix64(
      HashExpressions.splitmix64(id.cast("long"))
        .bitwiseXOR(rep.cast("long")))
    (shiftrightunsigned(z, 11).cast("double") + lit(0.5)) /
      lit(9007199254740992.0) // 2^53
  }

  /** Poisson(1) multiplicity of a 53-bit uniform. */
  def poissonWeight(u: Column): Column =
    CumPoisson1.zipWithIndex.foldRight(lit(CumPoisson1.length.toLong)) {
      case ((c, k), rest) => when(u < c, k.toLong).otherwise(rest)
    }

  /** Per-group bootstrap CI of the mean of `valueCol`: R Poisson(1)
    * replicates, each replicate's mean an exact integer-sum ratio, the
    * interval the (k_lo, k_hi) ORDER STATISTICS of the replicate means
    * with `k_lo = max(1, floor(0.025 · R_live))` and
    * `k_hi = R_live − k_lo + 1` (R_live = replicates with nonzero total
    * weight — an all-zero replicate estimates nothing and is dropped).
    *
    * Shape: one map-side explode (×R), one partial-aggregating shuffle
    * at (group × rep) grain, one R-row window per group. Null values
    * are excluded up front (documented contract, mirrors the oracle).
    */
  def poissonCiOfMean(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, reps: Int = 100): DataFrame = {
    require(reps >= 2, s"need at least 2 replicates, got $reps")
    val base = df.select(col(groupCol), col(idCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
    val point = base.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col(valueCol)), 4).as("mean_est"))
    val perRep = base
      .withColumn("rep", explode(sequence(lit(0L), lit(reps - 1L))))
      .withColumn("__bs_w",
        poissonWeight(pairUniform(col(idCol), col("rep"))))
      .groupBy(col(groupCol), col("rep"))
      .agg(sum(col("__bs_w") * col(valueCol)).as("__bs_sw"),
        sum(col("__bs_w")).as("__bs_n"))
      .filter(col("__bs_n") > 0)
      .withColumn("__bs_mean",
        col("__bs_sw").cast("double") / col("__bs_n"))
    val byMean = Window.partitionBy(col(groupCol)).orderBy(col("__bs_mean"))
    val all = Window.partitionBy(col(groupCol))
    val ranked = perRep
      .withColumn("__bs_rn", row_number().over(byMean))
      .withColumn("__bs_live", count(lit(1)).over(all))
      .withColumn("__bs_klo",
        greatest(lit(1L), floor(col("__bs_live") * 0.025)))
      .withColumn("__bs_khi", col("__bs_live") - col("__bs_klo") + 1)
    val ci = ranked.groupBy(col(groupCol))
      .agg(any_value(col("__bs_live")).as("n_reps"),
        round(max(when(col("__bs_rn") === col("__bs_klo"),
          col("__bs_mean"))), 4).as("ci_lo"),
        round(max(when(col("__bs_rn") === col("__bs_khi"),
          col("__bs_mean"))), 4).as("ci_hi"))
    point.join(ci, Seq(groupCol))
  }
}
