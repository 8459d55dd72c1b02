package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multiple-testing control for experiment sweeps: a grouped two-arm
  * Welch z-test (one test per segment from one (group, arm)-grain
  * aggregation) and Benjamini–Hochberg step-up FDR selection over the
  * resulting test table.
  *
  * Replay discipline: z rounds at 1e-4 BEFORE the p-value, the normal
  * tail probability is an explicit Abramowitz–Stegun 26.2.17 polynomial
  * (one `exp` — every other op is +,·,/ on literals, so any engine
  * computes the identical expression tree) rounded at 1e-6, and every
  * BH decision compares those rounded grids only.
  *
  * Scale shape: the z table is segment-grain (one row per test);
  * BH's rank window runs over that bounded table, never over units —
  * the [[Abtest.mannWhitney]] experiment-sized-table contract.
  */
object Multiplicity {

  /** Two-sided normal tail p = 2(1−Φ(|z|)), A&S 26.2.17 (|ε| < 7.5e-8
    * — far inside the 1e-6 grid this rounds to).
    */
  def normalTwoSidedP(z: Column): Column = {
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    val pdf = exp(lit(-0.5) * az * az) * lit(0.3989422804014327)
    round(least(lit(1.0), lit(2.0) * pdf * poly), 6)
  }

  /** One Welch z per `groupCol`: arms meet inside each group (arm_a =
    * the lexicographically first arm — groups must have exactly two),
    * z from the [[Abtest.welchTTest]] closed form, p from
    * [[normalTwoSidedP]] of the 1e-4-rounded z (the large-sample
    * normal reading standard in high-volume experimentation).
    */
  def welchZBy(units: DataFrame, groupCol: String, armCol: String,
      yCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    val arms = units.groupBy(col(groupCol).as("grp"), col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"), sum(y).as("__sy"),
        sum(y * y).as("__syy"))
      .withColumn("__nd", col("n").cast("double"))
      .withColumn("__m", col("__sy") / col("__nd"))
      .withColumn("__s",
        ((col("__syy") - col("__sy") * col("__sy") / col("__nd")) /
          (col("__nd") - 1)) / col("__nd"))
    val w = Window.partitionBy(col("grp")).orderBy(col("arm"))
    val two = arms.withColumn("__rk", row_number().over(w))
      .withColumn("__na", count(lit(1)).over(Window.partitionBy(col("grp"))))
    val a = two.filter(col("__rk") === 1 && col("__na") === 2)
      .select(col("grp"), col("arm").as("arm_a"), col("n").as("n_a"),
        col("__m").as("__ma"), col("__s").as("__sa"))
    val b = two.filter(col("__rk") === 2)
      .select(col("grp"), col("arm").as("arm_b"), col("n").as("n_b"),
        col("__m").as("__mb"), col("__s").as("__sb"))
    a.join(b, Seq("grp"))
      .withColumn("z", round((col("__ma") - col("__mb")) /
        sqrt(col("__sa") + col("__sb")), 4))
      .select(col("grp"), col("arm_a"), col("arm_b"), col("n_a"),
        col("n_b"), round(col("__ma") - col("__mb"), 4).as("diff"),
        col("z"), normalTwoSidedP(col("z")).as("p"))
  }

  /** Null-p tests (a degenerate arm — n < 2 or zero variance makes
    * [[welchZBy]]/[[Abtest.pairwiseWelch]] emit null z → null p) carry
    * no evidence and are excluded from the ranked FAMILY: they get
    * rank NULL, threshold NULL, rejected = false. Without this split,
    * Spark's NULLS FIRST rank order hands rank 1 to a null p (DuckDB
    * ranks it LAST), the family size m counts it, and — for the
    * step-down — a null p can never be the first failure, so an
    * all-null family would reject everything. Shared by both
    * correction procedures.
    */
  private def splitNullP(tests: DataFrame, pCol: String)
      : (DataFrame, DataFrame) =
    (tests.filter(col(pCol).isNotNull), tests.filter(col(pCol).isNull))

  private def nullPSide(nulls: DataFrame, thresholdCol: String)
      : DataFrame =
    nulls
      .withColumn("rank", lit(null).cast("int"))
      .withColumn(thresholdCol, lit(null).cast("double"))
      .withColumn("rejected", lit(false))

  /** Benjamini–Hochberg step-up at FDR level `qPct`%: rank the m tests
    * by (p, key), reject every test at rank ≤ the LARGEST i with
    * `p_(i) ≤ i·q/m` (the step-up — a test can be rejected even where
    * its own inequality fails, riding a later rank that passes).
    * Emits the full accounting: rank, threshold, rejected. The window
    * is over the m-row test table only. Null-p tests sit outside the
    * family (see [[splitNullP]]): rank/threshold NULL, never rejected.
    */
  def benjaminiHochberg(tests0: DataFrame, pCol: String, keyCol: String,
      qPct: Int): DataFrame = {
    require(qPct >= 1 && qPct < 100, s"bad qPct $qPct")
    val (tests, nulls) = splitNullP(tests0, pCol)
    // ranks from the ordered prefix scan (the m-row test table is
    // config-bounded), m and the step-up cutoff as broadcast scalars —
    // no unpartitioned window anywhere
    val m = tests.agg(count(lit(1)).as("__m"))
    // PINNED: the step-up cutoff and the final projection both read
    // the ranked frame — uncached, each re-runs the rank scan
    val ranked = graft.CacheScope.register(
      Ranks.withOrderedPrefixScan(tests,
        Seq(col(pCol), col(keyCol)), Seq.empty, idxCol = "__rk")
      .withColumn("rank", col("__rk").cast("int")).drop("__rk")
      .crossJoin(broadcast(m))
      .withColumn("bh_threshold",
        round(col("rank").cast("double") * qPct /
          (lit(100.0) * col("__m")), 6))
      .withColumn("__pass",
        when(col(pCol) <= col("bh_threshold"), col("rank")))
      .persist())
    val kmax = ranked.agg(max(col("__pass")).as("__kmax"))
    ranked
      .crossJoin(broadcast(kmax))
      .withColumn("rejected",
        col("__kmax").isNotNull && col("rank") <= col("__kmax"))
      .drop("__m", "__pass", "__kmax")
      .unionByName(nullPSide(nulls, "bh_threshold"))
  }

  /** Holm–Bonferroni step-DOWN at FWER level `alphaPct`% — the
    * familywise companion to [[benjaminiHochberg]]'s FDR step-up:
    * rank the m tests by (p, key) and reject ranks strictly BELOW the
    * first rank k where `p_(k) > α/(m − k + 1)` (every test from the
    * first failure on survives — the step-down; no later rank can
    * rescue an earlier failure, the mirror image of BH). Controls
    * FWER under arbitrary dependence, uniformly more powerful than
    * plain Bonferroni. Emits rank, `holm_threshold`, `rejected`.
    *
    * Same execution as BH: ranks from the ordered prefix scan over
    * the config-bounded m-row test table, the first-failure rank as
    * one broadcast scalar. Thresholds snap at 6 (the grid handoff) —
    * mirrored textually by the oracle. Null-p tests sit outside the
    * family (see [[splitNullP]]): rank/threshold NULL, never rejected
    * — without the split a null p takes rank 1 (NULLS FIRST) yet can
    * never be the first failure, so it would come out "significant".
    */
  def holmBonferroni(tests0: DataFrame, pCol: String, keyCol: String,
      alphaPct: Int): DataFrame = {
    import graft.functions.Grid
    require(alphaPct >= 1 && alphaPct < 100, s"bad alphaPct $alphaPct")
    val (tests, nulls) = splitNullP(tests0, pCol)
    val m = tests.agg(count(lit(1)).as("__m"))
    // PINNED: the first-failure scalar and the final projection both
    // read the ranked frame
    val ranked = graft.CacheScope.register(
      Ranks.withOrderedPrefixScan(tests,
        Seq(col(pCol), col(keyCol)), Seq.empty, idxCol = "__rk")
      .withColumn("rank", col("__rk").cast("int")).drop("__rk")
      .crossJoin(broadcast(m))
      .withColumn("holm_threshold", Grid.snap(
        lit(alphaPct) / (lit(100.0) *
          (col("__m") - col("rank") + 1L).cast("double")), 6))
      .withColumn("__fail",
        when(col(pCol) > col("holm_threshold"), col("rank")))
      .persist())
    val kfail = ranked.agg(min(col("__fail")).as("__kfail"))
    ranked
      .crossJoin(broadcast(kfail))
      .withColumn("rejected",
        col("__kfail").isNull || col("rank") < col("__kfail"))
      .drop("__m", "__fail", "__kfail")
      .unionByName(nullPSide(nulls, "holm_threshold"))
  }
}
