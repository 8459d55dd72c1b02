package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CUPED — Controlled-experiment Using Pre-Experiment Data (Deng,
  * Xu, Kohavi & Walker, WSDM 2013): the standard variance-reduction
  * trick for A/B metrics. Each unit's experiment-period metric Y is
  * adjusted by its pre-period metric X:
  *
  *   Y_adj = Y − θ·(X − E[X]),   θ = cov(X, Y) / var(X)
  *
  * X predates the treatment, so E[Y_adj] per arm is unbiased for
  * E[Y] while var(Y_adj) shrinks by the squared X–Y correlation —
  * the same experiment reaches significance with a fraction of the
  * traffic.
  *
  * Scale shape: θ and E[X] come from ONE aggregation over units
  * (five sums), carried as a one-row broadcast frame (the
  * scalar-subquery device — no driver collect); the adjustment is a
  * map-only projection; the per-arm summary is one more partial-agg
  * shuffle at arm grain. Nothing subject-grain ever hits a window.
  *
  * Portability: θ is computed from raw sums by the textbook formula
  * and ROUNDED TO 6 dp before the adjustment is applied, so both
  * engines adjust with the IDENTICAL θ (unrounded, the two engines'
  * different summation orders would each produce their own θ and
  * every downstream number would drift); per-arm outputs round at 4.
  * Variances use the explicit sum-of-squares formula, not the
  * engine's var_samp, so the replay is the same arithmetic.
  */
object Abtest {

  /** Two-sample tests are defined over exactly two arms; a third arm
    * would silently pollute the pooled ranks / tie correction (the
    * arm table previously just kept the first two in sort order), so
    * it is an ERROR, not a truncation. One distinct-count over the
    * bounded arm column.
    */
  private def requireTwoArms(units: DataFrame, armCol: String,
      op: String): Unit = {
    val n = units.select(col(armCol)).distinct().count()
    require(n == 2, s"$op needs exactly 2 arms, got $n — filter " +
      s"`$armCol` to the two arms under test first")
  }

  /** Per-unit CUPED adjustment: input one row per unit with pre-period
    * `xCol` and experiment `yCol`; output adds `y_cuped`. θ pooled
    * across arms (pre-period data is treatment-independent).
    */
  def cupedAdjust(units: DataFrame, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val stats = units.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(x).as("__sx"), sum(y).as("__sy"),
      sum(x * x).as("__sxx"), sum(x * y).as("__sxy"))
    units.crossJoin(broadcast(stats))
      .withColumn("__theta",
        round((col("__sxy") - col("__sx") * col("__sy") / col("__n")) /
          (col("__sxx") - col("__sx") * col("__sx") / col("__n")), 6))
      .withColumn("y_cuped",
        y - col("__theta") * (x - col("__sx") / col("__n")))
      .drop("__n", "__sx", "__sy", "__sxx", "__sxy", "__theta")
  }

  /** Welch's unequal-variance t-test between two arms — the default
    * experiment significance test (never assume equal variances).
    * Closed-form from per-arm sums: t = (m̄₁ − m̄₂)/√(s₁²/n₁ + s₂²/n₂),
    * Welch–Satterthwaite df. One aggregation at arm grain; everything
    * else is arithmetic on the two-row table. Outputs round at 4; no
    * p-value (that needs the t CDF — report |t| against the usual
    * 1.96/2.58 lines like the rest of the z-family here).
    */
  def welchTTest(units: DataFrame, armCol: String,
      yCol: String): DataFrame = {
    requireTwoArms(units, armCol, "welchTTest")
    val y = col(yCol).cast("double")
    val arms = units.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"), sum(y).as("__sy"),
        sum(y * y).as("__syy"))
      .withColumn("__nd", col("n").cast("double"))
      .withColumn("__m", col("__sy") / col("__nd"))
      .withColumn("__v",
        (col("__syy") - col("__sy") * col("__sy") / col("__nd")) /
          (col("__nd") - 1))
    // two-arm pairing WITHOUT the global rank window: exactly two
    // arms (guarded above), so the single a<b self-join row IS the
    // (rank 1, rank 2) pair the old window produced
    val a = arms
      .select(col("arm").as("arm_a"), col("n").as("n_a"),
        col("__m").as("__ma"), col("__v").as("__va"),
        (col("__v") / col("__nd")).as("__sa"))
    val b = arms
      .select(col("arm").as("arm_b"), col("n").as("n_b"),
        col("__m").as("__mb"), col("__v").as("__vb"),
        (col("__v") / col("__nd")).as("__sb"))
    a.join(broadcast(b), col("arm_a") < col("arm_b"))
      .select(col("arm_a"), col("arm_b"), col("n_a"), col("n_b"),
        round(col("__ma"), 4).as("mean_a"),
        round(col("__mb"), 4).as("mean_b"),
        round(col("__ma") - col("__mb"), 4).as("diff"),
        round((col("__ma") - col("__mb")) /
          sqrt(col("__sa") + col("__sb")), 4).as("t"),
        round(pow(col("__sa") + col("__sb"), 2) /
          (pow(col("__sa"), 2) / (col("n_a").cast("double") - 1) +
            pow(col("__sb"), 2) / (col("n_b").cast("double") - 1)), 4)
          .as("df"))
  }

  /** Mann–Whitney U (rank-sum) between two arms — the nonparametric
    * companion for heavy-tailed metrics where means mislead. Exact
    * mid-ranks over a (value, id)-deterministic order (the q191 AUC
    * device — U and AUC are the same statistic), normal-approximation
    * z with the tie-correction term. One global rank window over the
    * unit table (unit tables are experiment-sized by construction —
    * documented; shard at subject grain before this if not).
    */
  def mannWhitney(units: DataFrame, armCol: String, idCol: String,
      yCol: String): DataFrame = {
    requireTwoArms(units, armCol, "mannWhitney")
    val y = col(yCol).cast("double")
    // global unit rank via the distributed sort+zipWithIndex device —
    // no single-partition rank window over the unit table
    val ranked = Ranks.withGlobalRowNumber(
        units.select(col(armCol).as("arm"), col(idCol).as("__id"),
          y.as("__y")),
        Seq(col("__y"), col("__id")), "__rn0")
      .withColumn("__rn", col("__rn0").cast("double"))
      .withColumn("__mid",
        avg(col("__rn")).over(Window.partitionBy(col("__y"))))
    // tie correction needs Σ(t³−t) over tie groups — bounded by
    // distinct values
    val ties = ranked.groupBy(col("__y"))
      .agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("__tc"),
        sum(col("t")).as("__n"))
    val arms = ranked.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("__mid")).as("__rs"))
    val a = arms
      .select(col("arm").as("arm_a"), col("n").as("n_a"),
        col("__rs").as("__rsa"))
    val b = arms
      .select(col("arm").as("arm_b"), col("n").as("n_b"))
    a.join(broadcast(b), col("arm_a") < col("arm_b"))
      .crossJoin(broadcast(ties))
      .withColumn("u",
        col("__rsa") - col("n_a").cast("double") *
          (col("n_a").cast("double") + 1) / 2)
      .withColumn("__mu",
        col("n_a").cast("double") * col("n_b").cast("double") / 2)
      .withColumn("__sig", {
        val n = col("__n").cast("double")
        val prod = col("n_a").cast("double") * col("n_b").cast("double")
        sqrt(prod / 12 * ((n + 1) -
          col("__tc").cast("double") / (n * (n - 1))))
      })
      .select(col("arm_a"), col("arm_b"), col("n_a"), col("n_b"),
        round(col("u"), 4).as("u"),
        round((col("u") - col("__mu")) / col("__sig"), 4).as("z"))
  }

  /** Per-arm experiment readout, plain and CUPED side by side:
    * (arm, n, mean_y, mean_y_cuped, var_y, var_y_cuped) — the
    * var_y_cuped / var_y ratio is the traffic a matched-power
    * experiment saves. Variances are sample variances from explicit
    * sums; everything rounds at 4 dp.
    */
  def cupedSummary(units: DataFrame, armCol: String,
      xCol: String, yCol: String): DataFrame = {
    val adj = cupedAdjust(units, xCol, yCol)
    val y = col(yCol).cast("double")
    val a = col("y_cuped")
    adj.groupBy(col(armCol))
      .agg(count(lit(1)).as("n"),
        sum(y).as("__sy"), sum(y * y).as("__syy"),
        sum(a).as("__sa"), sum(a * a).as("__saa"))
      .withColumn("__nd", col("n").cast("double"))
      .select(col(armCol), col("n"),
        round(col("__sy") / col("__nd"), 4).as("mean_y"),
        round(col("__sa") / col("__nd"), 4).as("mean_y_cuped"),
        round((col("__syy") - col("__sy") * col("__sy") / col("__nd")) /
          (col("__nd") - 1), 4).as("var_y"),
        round((col("__saa") - col("__sa") * col("__sa") / col("__nd")) /
          (col("__nd") - 1), 4).as("var_y_cuped"))
  }

  /** Two-proportion z-test with the POOLED standard error — the
    * conversion-rate test proper (a Welch t on 0/1 outcomes uses the
    * unpooled variance; under H₀ p_a = p_b the pooled form is the
    * textbook statistic):
    * `z = (p̂_a − p̂_b) / √(p̂(1−p̂)(1/n_a + 1/n_b))`.
    * One arm-grain aggregation; everything else is arithmetic on the
    * two-row table. Degenerate pools (p̂ ∈ {0, 1}) yield null z.
    */
  def proportionTest(units: DataFrame, armCol: String,
      successCol: String): DataFrame = {
    requireTwoArms(units, armCol, "proportionTest")
    val sCol = col(successCol).cast("boolean")
    val arms = units.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(when(sCol, 1L).otherwise(0L)).as("__k"))
      .withColumn("__p", col("__k") / col("n").cast("double"))
    val a = arms
      .select(col("arm").as("arm_a"), col("n").as("n_a"),
        col("__k").as("k_a"), col("__p").as("__pa"))
    val b = arms
      .select(col("arm").as("arm_b"), col("n").as("n_b"),
        col("__k").as("k_b"), col("__p").as("__pb"))
    a.join(broadcast(b), col("arm_a") < col("arm_b"))
      .withColumn("__pool", (col("k_a") + col("k_b")) /
        (col("n_a") + col("n_b")).cast("double"))
      .select(col("arm_a"), col("arm_b"), col("n_a"), col("n_b"),
        col("k_a"), col("k_b"),
        round(col("__pa"), 6).as("p_a"),
        round(col("__pb"), 6).as("p_b"),
        round(col("__pa") - col("__pb"), 6).as("diff"),
        when(col("__pool") > 0 && col("__pool") < 1,
          round((col("__pa") - col("__pb")) /
            sqrt(col("__pool") * (lit(1.0) - col("__pool")) *
              (lit(1.0) / col("n_a").cast("double") +
                lit(1.0) / col("n_b").cast("double"))), 4)).as("z"))
  }

  /** Exact two-sample Kolmogorov–Smirnov test — "did the whole
    * DISTRIBUTION shift", where the mean tests (Welch/CUPED) and the
    * rank test (Mann–Whitney) each see only one facet:
    * `D = max_v |F_a(v) − F_b(v)|` over the pooled empirical CDFs,
    * with the large-sample α = 0.05 line
    * `D_crit = 1.358·√((n_a+n_b)/(n_a·n_b))`.
    *
    * Scale shape: ONE aggregation to (distinct value, side counts),
    * then cumulative windows over that VALUE-GRAIN table — exact and
    * bounded for gridded metrics (money grids, counts, scores);
    * pre-quantize a genuinely continuous metric first (the
    * winsorize-cut contract), because the distinct-value table is
    * the state. CDF steps round at 1e-6; the argmax takes the
    * smallest value on ties, so the readout replays exactly.
    */
  def ksTest(units: DataFrame, inA: Column, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val byV = units.filter(v.isNotNull)
      .groupBy(v.as("v"))
      .agg(sum(when(inA, 1L).otherwise(0L)).as("__ca"),
        sum(when(inA, 0L).otherwise(1L)).as("__cb"))
    val tot = byV.agg(sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"))
    // cumulative side counts via the ordered prefix scan (exact
    // integer sums — no unpartitioned window over the value grid);
    // the argmax is a TakeOrdered(1), not a rank window
    val steps = Ranks.withOrderedPrefixScan(
        byV.crossJoin(broadcast(tot)), Seq(col("v")),
        Seq("__ca" -> "__cca", "__cb" -> "__ccb"))
      .withColumn("__fa", col("__cca") / col("__na").cast("double"))
      .withColumn("__fb", col("__ccb") / col("__nb").cast("double"))
      .withColumn("__d", round(abs(col("__fa") - col("__fb")), 6))
    steps
      .orderBy(col("__d").desc, col("v")).limit(1)
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        col("__d").as("d"), col("v").as("v_at_d"),
        // 1/na + 1/nb, never na·nb — the product overflows a long at
        // the multi-billion-unit grain this test targets
        round(lit(1.358) * sqrt(lit(1.0) / col("__na").cast("double") +
          lit(1.0) / col("__nb").cast("double")), 6).as("d_crit_05"),
        (col("__d") > lit(1.358) *
          sqrt(lit(1.0) / col("__na").cast("double") +
            lit(1.0) / col("__nb").cast("double"))).as("reject_05"))
  }

  /** Inverse-propensity-weighted ATE by subclassification — the
    * observational-data estimator for "what did the treatment do"
    * when assignment correlated with covariates: propensity
    * `e_s = n_treat_s / n_s` per covariate STRATUM (clipped to
    * [clipLo, clipHi] — the standard positivity guard), each
    * stratum's outcome mass reweighted by `1/e_s` (treated) or
    * `1/(1−e_s)` (control). Both the Horvitz–Thompson ATE (divide by
    * N) and the Hájek form (divide by the weight mass — the
    * self-normalized estimator that tolerates clipping bias) ride on
    * every row, next to the naive difference they correct.
    *
    * Portability/scale shape: weights factor OUT of the row sums —
    * per-stratum `sum(y·t)/e_s`, never `sum(y·t/e_s)` — so the only
    * corpus-grain float sums are money-grid outcome masses (the house
    * events device); the overall estimates fold over the SORTED
    * stratum list (config-bounded) with a 1e-6 re-round per step, the
    * q260 IV device, so the estimator replays bit-exactly. One
    * stratum-grain aggregation, one broadcast 1-row overall frame.
    */
  def ipwAte(df: DataFrame, strataCols: Seq[String], treatCol: String,
      yCol: String, clipLo: Double = 0.02,
      clipHi: Double = 0.98): DataFrame = {
    require(strataCols.nonEmpty, "need at least one stratum column")
    require(clipLo > 0 && clipHi < 1 && clipLo < clipHi,
      s"bad clip [$clipLo, $clipHi]")
    val t = col(treatCol).cast("boolean")
    val y = col(yCol).cast("double")
    val strata = df.filter(y.isNotNull)
      .groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(t, 1L).otherwise(0L)).as("n_treat"),
        round(sum(when(t, y).otherwise(lit(0.0))), 2).as("sum_y_t"),
        round(sum(when(t, lit(0.0)).otherwise(y)), 2).as("sum_y_c"))
      .withColumn("e", round(least(greatest(
        col("n_treat").cast("double") / col("n").cast("double"),
        lit(clipLo)), lit(clipHi)), 6))
      .withColumn("wyt", round(col("sum_y_t") / col("e"), 6))
      .withColumn("wyc", round(col("sum_y_c") / (lit(1.0) - col("e")), 6))
      .withColumn("wnt",
        round(col("n_treat").cast("double") / col("e"), 6))
      .withColumn("wnc", round((col("n") - col("n_treat")).cast("double")
        / (lit(1.0) - col("e")), 6))
      .withColumn("__sk", concat_ws("", strataCols.map(col): _*))
    // stratum-ordered fold on the ENGINE-EXACT snap (round() ties are
    // engine-dependent; the q253/q254 divergence class) — operator and
    // oracle run the same float program per step
    def foldSum(c: String) = graft.functions.Grid.snap(aggregate(
      sort_array(collect_list(struct(col("__sk"), col(c).as("v")))),
      lit(0.0),
      (acc, x) => graft.functions.Grid.snap(acc + x("v"))))
    val overall = strata.agg(
      sum(col("n")).as("__N"), sum(col("n_treat")).as("__NT"),
      round(sum(col("sum_y_t")), 2).as("__SYT"),
      round(sum(col("sum_y_c")), 2).as("__SYC"),
      foldSum("wyt").as("__swyt"), foldSum("wyc").as("__swyc"),
      foldSum("wnt").as("__swnt"), foldSum("wnc").as("__swnc"))
      .select(
        col("__N").as("n_units"), col("__NT").as("n_treated"),
        when(col("__NT") > 0 && col("__N") > col("__NT"),
          round(col("__SYT") / col("__NT").cast("double") -
            col("__SYC") / (col("__N") - col("__NT")).cast("double"), 4))
          .as("naive_diff"),
        round((col("__swyt") - col("__swyc")) /
          col("__N").cast("double"), 4).as("ate_ipw"),
        when(col("__swnt") > 0 && col("__swnc") > 0,
          round(col("__swyt") / col("__swnt") -
            col("__swyc") / col("__swnc"), 4)).as("ate_hajek"))
    strata.crossJoin(broadcast(overall))
      .select((strataCols.map(col) ++ Seq(col("n"), col("n_treat"),
        col("e"), col("sum_y_t"), col("sum_y_c"), col("n_units"),
        col("n_treated"), col("naive_diff"), col("ate_ipw"),
        col("ate_hajek"))): _*)
  }

  /** Difference-in-differences on the 2 × 2 (treat, post) panel — the
    * quasi-experimental estimator for rollouts WITHOUT randomization
    * (feature launched to one segment; the other segment's pre→post
    * drift is the counterfactual):
    *
    *   DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre)
    *
    * with the four-cell normal SE √(Σ s²_cell/n_cell) and z = DiD/SE —
    * the unpooled (Welch-style) variance, never the equal-variance
    * pool. Identification rides on parallel pre-trends; callers should
    * eyeball the pre-period with the forecast family first.
    *
    * Input: ONE ROW PER UNIT-PERIOD (aggregate raw events to units
    * first — pseudo-replication at event grain would shrink the SE
    * dishonestly). `treatCol`/`postCol` boolean. Scale shape: one
    * partial-agg pass producing a single 12-number row; every
    * downstream step is arithmetic on that row.
    */
  def diffInDiff(units: DataFrame, treatCol: String, postCol: String,
      yCol: String): DataFrame = {
    val y = col(yCol).cast("double")
    val t = col(treatCol).cast("boolean")
    val p = col(postCol).cast("boolean")
    def inCell(tv: Boolean, pv: Boolean) = t === tv && p === pv
    def n(tv: Boolean, pv: Boolean) =
      sum(when(inCell(tv, pv), 1L).otherwise(0L))
    def s(tv: Boolean, pv: Boolean, f: Column) =
      sum(when(inCell(tv, pv), f).otherwise(lit(0.0)))
    // order fixes the SE addition sequence (t0+t1+c0+c1) — the oracle
    // must add in the same order for bit-identical rounding
    val cellTags = Seq((true, false, "t0"), (true, true, "t1"),
      (false, false, "c0"), (false, true, "c1"))
    val aggs = cellTags.flatMap { case (tv, pv, tag) => Seq(
      n(tv, pv).as(s"__n_$tag"), s(tv, pv, y).as(s"__sy_$tag"),
      s(tv, pv, y * y).as(s"__syy_$tag"))
    }
    var row = units.filter(y.isNotNull)
      .agg(aggs.head, aggs.tail: _*)
    cellTags.foreach { case (_, _, tag) =>
      row = row
        .withColumn(s"__m_$tag",
          col(s"__sy_$tag") / col(s"__n_$tag").cast("double"))
        .withColumn(s"__v_$tag", (col(s"__syy_$tag") -
          col(s"__sy_$tag") * col(s"__sy_$tag") /
            col(s"__n_$tag").cast("double")) /
          (col(s"__n_$tag").cast("double") - 1))
    }
    val did = (col("__m_t1") - col("__m_t0")) -
      (col("__m_c1") - col("__m_c0"))
    val se = sqrt(cellTags.map { case (_, _, tag) =>
      col(s"__v_$tag") / col(s"__n_$tag").cast("double")
    }.reduce(_ + _))
    row.select(
      col("__n_t0").as("n_treat_pre"), col("__n_t1").as("n_treat_post"),
      col("__n_c0").as("n_ctrl_pre"), col("__n_c1").as("n_ctrl_post"),
      round(col("__m_t0"), 4).as("mean_treat_pre"),
      round(col("__m_t1"), 4).as("mean_treat_post"),
      round(col("__m_c0"), 4).as("mean_ctrl_pre"),
      round(col("__m_c1"), 4).as("mean_ctrl_post"),
      round(did, 4).as("did"),
      round(se, 4).as("se"),
      round(did / se, 4).as("z"))
  }

  /** McNemar's test (1947) on PAIRED binary outcomes — did the same
    * units flip between two conditions (before/after a launch, two
    * prompts on the same doc)? Only the DISCORDANT pairs carry
    * information: with `b` = only-first successes and `c` =
    * only-second, the continuity-corrected
    * `χ² = (|b − c| − 1)² / (b + c)` refers to χ²(1) (3.841 at 5%).
    *
    * Engine-exact: one aggregation to four exact-long cells, one
    * division at the snapped readout (null when no pair is
    * discordant — no information, not a zero statistic). Returns one
    * row: `(n_pairs, n_both, n_only_first, n_only_second, n_neither,
    * chi2, significant)`.
    */
  def mcNemar(df: DataFrame, firstCol: String,
      secondCol: String): DataFrame = {
    import graft.functions.Grid
    val a = coalesce(col(firstCol).cast("boolean"), lit(false))
    val b = coalesce(col(secondCol).cast("boolean"), lit(false))
    df.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(a && b, 1L).otherwise(0L)).as("n_both"),
      sum(when(a && !b, 1L).otherwise(0L)).as("n_only_first"),
      sum(when(!a && b, 1L).otherwise(0L)).as("n_only_second"),
      sum(when(!a && !b, 1L).otherwise(0L)).as("n_neither"))
      .withColumn("chi2", Grid.snap(
        when(col("n_only_first") + col("n_only_second") > 0L,
          (abs(col("n_only_first") - col("n_only_second")) - 1L)
            .cast("double") *
            (abs(col("n_only_first") - col("n_only_second")) - 1L) /
            (col("n_only_first") + col("n_only_second"))), 4))
      .withColumn("significant",
        coalesce(col("chi2") > 3.841, lit(false)))
  }

  /** Kruskal–Wallis H (1952) — the k-arm rank test ([[mannWhitney]]
    * generalized past the two-arm guard): pooled midranks, per-arm
    * rank sums, `H = 12/(N(N+1)) Σ R_i²/n_i − 3(N+1)`, divided by the
    * tie correction `1 − Σ(t³−t)/(N³−N)`. Refers to χ²(k−1).
    *
    * Execution: the pooled rank comes from the distributed
    * sort+zipWithIndex device (no single-partition window); midranks
    * via the (value)-keyed tie window; doubled midranks are exact
    * longs, so per-arm rank sums are exact and the H tree is fixed
    * float arithmetic — engine-exact, snapped. Returns one row:
    * `(n_total, k_arms, df, h, tie_correction, h_corrected)`.
    *
    * Skew contract: the tie window partitions by the RAW metric value,
    * so its hottest partition is the largest tie group. On real-valued
    * metrics (this operator's contract) tie groups are small; a
    * pathological (near-)constant metric concentrates one hot
    * partition — pre-aggregate such data to (value → count) and use a
    * count-weighted rank formula instead of row-grain ranking.
    */
  def kruskalWallis(units: DataFrame, armCol: String, idCol: String,
      yCol: String): DataFrame = {
    import graft.functions.Grid
    val base = units
      .filter(col(yCol).isNotNull)
      .select(col(armCol).cast("string").as("__arm"),
        col(idCol).as("__id"), col(yCol).cast("double").as("__y"))
    val ranked = Ranks.withGlobalRowNumber(base,
        Seq(col("__y"), col("__id")), "__rn")
      // doubled midrank = min+max position over the tie group — exact
      .withColumn("__r2",
        (min(col("__rn")).over(Window.partitionBy(col("__y"))) +
          max(col("__rn")).over(Window.partitionBy(col("__y")))))
    val arms = ranked.groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"), sum(col("__r2")).as("__rs2"))
    val ties = ranked.groupBy(col("__y"))
      .agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("__tc"),
        sum(col("t")).as("__N"))
    // Σ R_i²/n_i with R_i = rs2/2: exact longs to double ONCE, then a
    // fixed tree; the bounded arm table folds in arm order
    val sums = arms
      .select(struct(col("__arm"),
        (col("__rs2").cast("double") * col("__rs2").cast("double") /
          (lit(4.0) * col("__n"))).as("v")).as("__s"))
      .agg(count(lit(1)).as("k_arms"),
        expr("aggregate(sort_array(collect_list(__s)), " +
          "CAST(0.0 AS DOUBLE), (a, x) -> a + x.v)").as("__sr"))
    // N³ in DOUBLE (a long product would overflow past N ~ 2M); the
    // identical expression tree runs in the oracle, and the all-tied
    // degenerate (correction 0) nulls h_corrected
    val nD = col("__N").cast("double")
    val corr = lit(1.0) - col("__tc").cast("double") /
      (nD * nD * nD - nD)
    val h = lit(12.0) / (nD * (nD + 1.0)) * col("__sr") -
      lit(3.0) * (nD + 1.0)
    sums.crossJoin(broadcast(ties))
      .select(
        col("__N").as("n_total"), col("k_arms"),
        (col("k_arms") - 1L).as("df"),
        Grid.snap(h, 4).as("h"),
        Grid.snap(corr, 6).as("tie_correction"),
        Grid.snap(when(corr > 0.0, h / corr), 4).as("h_corrected"))
  }

  /** Wilcoxon signed-rank test (1945) — the paired-CONTINUOUS
    * companion to [[mcNemar]]'s paired-binary: per unit `d = y₂ − y₁`,
    * zeros drop (no information), |d| takes pooled midranks, and
    * `W⁺ = Σ_{d>0} rank` refers to the normal approximation
    * `z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(t³−t)/48)`.
    *
    * Engine-exact: doubled midranks are exact longs (the
    * [[kruskalWallis]] device — distributed sort-rank + tie window,
    * never a single-partition rank), so W⁺, both moments, and the tie
    * term are exact; one fixed float tree at the snapped readout.
    * Returns one row: `(n_pairs, n_nonzero, w_plus, z, significant)`
    * — z null when every |d| ties (zero variance).
    *
    * Skew contract (the [[kruskalWallis]] note): the tie window
    * partitions by |d|, so a (near-)constant difference metric makes
    * one hot partition; real-valued differences are the contract.
    */
  def wilcoxonSignedRank(df: DataFrame, idCol: String, y1Col: String,
      y2Col: String): DataFrame = {
    import graft.functions.Grid
    val base = df
      .filter(col(y1Col).isNotNull && col(y2Col).isNotNull)
      .select(col(idCol).as("__id"),
        (col(y2Col).cast("double") - col(y1Col).cast("double"))
          .as("__d"))
    val nz = base.filter(col("__d") =!= 0.0)
      .withColumn("__ad", abs(col("__d")))
    val ranked = Ranks.withGlobalRowNumber(nz,
        Seq(col("__ad"), col("__id")), "__rn")
      .withColumn("__r2",
        min(col("__rn")).over(Window.partitionBy(col("__ad"))) +
          max(col("__rn")).over(Window.partitionBy(col("__ad"))))
    val stats = ranked.agg(
      count(lit(1)).as("__n"),
      sum(when(col("__d") > 0.0, col("__r2")).otherwise(0L))
        .as("__w2"))
    val ties = ranked.groupBy(col("__ad"))
      .agg(count(lit(1)).as("t"))
      .agg(coalesce(sum(col("t") * col("t") * col("t") - col("t")),
        lit(0L)).as("__tc"))
    val total = df
      .filter(col(y1Col).isNotNull && col(y2Col).isNotNull)
      .agg(count(lit(1)).as("n_pairs"))
    val nD = col("__n").cast("double")
    // doubled-rank algebra: μ₂ = n(n+1)/2 exactly; σ doubles too, so
    // z = (W₂ − μ₂) / (2σ) — every operand exact until the one tree
    val z = (col("__w2") - col("__n") * (col("__n") + 1L) / 2L)
      .cast("double") /
      (lit(2.0) * sqrt(nD * (nD + 1.0) * (lit(2.0) * nD + 1.0) /
        24.0 - col("__tc").cast("double") / 48.0))
    total.crossJoin(broadcast(stats)).crossJoin(broadcast(ties))
      .select(col("n_pairs"), col("__n").as("n_nonzero"),
        (col("__w2").cast("double") / 2.0).as("w_plus"),
        Grid.snap(when(
          nD * (nD + 1.0) * (lit(2.0) * nD + 1.0) / 24.0 -
            col("__tc").cast("double") / 48.0 > 0.0, z), 4).as("z"))
      .withColumn("significant",
        coalesce(abs(col("z")) > 1.96, lit(false)))
  }

  /** Pearson's χ² test of independence over an r×k contingency — the
    * "are these two categoricals related at all" fundamental: observed
    * cell counts vs `e = rowTotal·colTotal/N`,
    * `χ² = Σ (o − e)²/e`, df = (r−1)(k−1).
    *
    * One aggregation to the bounded contingency table (exact longs);
    * expected values are single divisions of exact long products
    * (documented < 2^63 bound: totals < ~3B); the cell terms fold in
    * (row, col) order — by-construction replay, snapped readout.
    * Returns `(n, r_levels, c_levels, df, chi2)`.
    */
  def chiSquareIndependence(df: DataFrame, rowCol: String,
      colCol: String): DataFrame = {
    import graft.functions.Grid
    val cells = df
      .filter(col(rowCol).isNotNull && col(colCol).isNotNull)
      .groupBy(col(rowCol).cast("string").as("__r"),
        col(colCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__o"))
    val rt = cells.groupBy(col("__r")).agg(sum(col("__o")).as("__rt"))
    val ct = cells.groupBy(col("__c")).agg(sum(col("__o")).as("__ct"))
    val tot = cells.agg(sum(col("__o")).as("__n"))
    val levels = cells.agg(countDistinct(col("__r")).as("r_levels"),
      countDistinct(col("__c")).as("c_levels"))
    // the FULL r×c grid, not just observed cells: a combination with
    // zero observed count still contributes its (0−e)²/e = e term —
    // dropping it understates χ² on sparse tables while df still
    // assumes the complete grid. Level tables are bounded (distinct
    // categories), so the cross join is broadcast-sized.
    val grid = cells.select(col("__r")).distinct()
      .crossJoin(broadcast(cells.select(col("__c")).distinct()))
    val full = grid.join(cells, Seq("__r", "__c"), "left")
      .na.fill(0L, Seq("__o"))
    val terms = full.join(rt, Seq("__r")).join(ct, Seq("__c"))
      .crossJoin(broadcast(tot))
      .withColumn("__e",
        (col("__rt") * col("__ct")).cast("double") / col("__n"))
      .select(col("__n"), struct(col("__r"), col("__c"),
        ((col("__o") - col("__e")) * (col("__o") - col("__e")) /
          col("__e")).as("v")).as("__t"))
    terms.groupBy(col("__n"))
      .agg(expr("aggregate(sort_array(collect_list(__t)), " +
        "CAST(0.0 AS DOUBLE), (a, x) -> a + x.v)").as("__chi"))
      .crossJoin(broadcast(levels))
      .select(col("__n").as("n"), col("r_levels"), col("c_levels"),
        ((col("r_levels") - 1L) * (col("c_levels") - 1L)).as("df"),
        Grid.snap(col("__chi"), 4).as("chi2"))
  }

  /** The shared one-way decomposition core behind [[anovaF]] and
    * [[brownForsythe]]: input is `(__arm: string, __c: long)` with
    * `__c` already on an exact integer grid, so every moment is
    * order-free integer arithmetic. Per arm: `n_i` (long), `s_i = Σc`
    * and `q_i = Σc²` as DECIMAL(38,0) (a long Σc² overflows at
    * ~10⁶ rows of 10⁷-scaled values; decimal is exact to 1e38 —
    * headroom past 10⁹ rows of 10¹⁴ squares). The only fractional
    * step is the k-bounded arm fold of `s_i²/n_i` (each term one
    * exact-decimal-to-double cast + one division, folded in arm
    * order — the [[kruskalWallis]] device), then the F tree.
    *
    * Output-snap bound: the SS columns snap at 4 dp, so SS·10⁴ must
    * stay under 2⁶³ (Spark's FLOOR(DOUBLE) lands in a long) —
    * SS ≤ ~9·10¹⁴ in scaled units. Past that, re-snap at the caller
    * on a coarser grid; F and η² are ratios and unaffected.
    */
  private def anovaCore(base: DataFrame): DataFrame = {
    import graft.functions.Grid
    val arms = base.groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__c").cast("decimal(38,0)")).as("__s"),
        sum(col("__c").cast("decimal(19,0)") * col("__c"))
          .as("__q"))
    val folded = arms
      .select(struct(col("__arm"),
        (col("__s").cast("double") * col("__s").cast("double") /
          col("__n").cast("double")).as("v")).as("__t"),
        col("__n"), col("__s"), col("__q"))
      .agg(count(lit(1)).as("k_arms"),
        sum(col("__n")).as("n_total"),
        sum(col("__s")).as("__S"),
        sum(col("__q")).as("__Q"),
        expr("aggregate(sort_array(collect_list(__t)), " +
          "CAST(0.0 AS DOUBLE), (a, x) -> a + x.v)").as("__sg"))
    val nD = col("n_total").cast("double")
    val grand = col("__S").cast("double") * col("__S").cast("double") /
      nD
    val ssb = col("__sg") - grand
    val ssw = col("__Q").cast("double") - col("__sg")
    val df1 = (col("k_arms") - 1L).cast("double")
    val df2 = (col("n_total") - col("k_arms")).cast("double")
    val f = (ssb / df1) / (ssw / df2)
    folded.select(col("n_total"), col("k_arms"),
      (col("k_arms") - 1L).as("df_between"),
      (col("n_total") - col("k_arms")).as("df_within"),
      Grid.snap(ssb, 4).as("ss_between"),
      Grid.snap(ssw, 4).as("ss_within"),
      Grid.snap(when(col("k_arms") >= 2L && df2 > 0.0 && ssw > 0.0, f),
        4).as("f_stat"),
      Grid.snap(when(ssb + ssw > 0.0, ssb / (ssb + ssw)), 6)
        .as("eta_sq"))
  }

  /** One-way ANOVA F (Fisher 1925) — the parametric k-arm mean test
    * completing the family around [[kruskalWallis]] (its rank-based
    * twin): `F = (SSB/(k−1)) / (SSW/(N−k))` from the between/within
    * sum-of-squares decomposition. Returns one row `(n_total, k_arms,
    * df_between, df_within, ss_between, ss_within, f_stat, eta_sq)`;
    * `f_stat` is null under zero within-variance, `eta_sq` is
    * SSB/SST (effect size).
    *
    * `scale` declares the metric's decimal grid (the
    * [[graft.operators.Seasonal.crossCorrelation]] convention):
    * values scale to exact longs, so all moments are order-free
    * integer sums in ONE partial-aggregated pass to the k-bounded arm
    * table — no window, no second scan. The output SS columns stay in
    * y units (divided by 10^2s once, inside the snapped tree).
    */
  def anovaF(units: DataFrame, armCol: String, idCol: String,
      yCol: String, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val p = math.pow(10.0, scale)
    val core = anovaCore(units
      .filter(col(yCol).isNotNull)
      .select(col(armCol).cast("string").as("__arm"),
        floor(col(yCol).cast("double") * p + 0.5).cast("long")
          .as("__c")))
    // SS back to y units: the snap already ran on the scaled tree, so
    // rescale the snapped grid value (exact: grid/10^2s is one divide)
    core.withColumn("ss_between", col("ss_between") / (p * p))
      .withColumn("ss_within", col("ss_within") / (p * p))
  }

  /** Brown–Forsythe test (1974) — Levene's variance-homogeneity test
    * with the MEDIAN center: per arm the exact median (doubled, so
    * even-count midpoints stay integral), per row the absolute
    * deviation `z = |y − med|` on the doubled grid, then the one-way
    * F over z ([[anovaCore]] — F is scale-invariant, so the doubled
    * grid changes no output bit of `f_stat`/`eta_sq`). Rejecting
    * means the arms' spreads differ — the assumption check run
    * BEFORE trusting [[anovaF]]'s pooled SSW.
    *
    * The per-arm order statistic runs in an arm-keyed window
    * (partition = one arm's rows): with k bounded and N huge that is
    * the honest cost of an EXACT median — the approximate path at
    * corpus scale is the existing quantile-sketch family. Returns
    * the [[anovaCore]] row with `ss_*` in doubled-scaled-z units.
    */
  def brownForsythe(units: DataFrame, armCol: String, idCol: String,
      yCol: String, scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val p = math.pow(10.0, scale)
    val base = units
      .filter(col(yCol).isNotNull)
      .select(col(armCol).cast("string").as("__arm"),
        col(idCol).as("__id"),
        floor(col(yCol).cast("double") * p + 0.5).cast("long")
          .as("__c"))
    val w = Window.partitionBy(col("__arm"))
    val ranked = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__arm"))
          .orderBy(col("__c"), col("__id"))))
      .withColumn("__na", count(lit(1)).over(w))
    // doubled median = c[(n+1)/2] + c[(n+2)/2] (1-based): odd n takes
    // the middle twice, even n the two middles — exact longs
    // integer div, not Column./ (which is DOUBLE division — a
    // fractional midpoint position would match no row at all)
    val med2 = ranked
      .filter(col("__rn") === expr("(__na + 1) div 2") ||
        col("__rn") === expr("(__na + 2) div 2"))
      .groupBy(col("__arm"))
      .agg((when(max(col("__na")) % 2L === 1L, lit(2L))
        .otherwise(lit(1L)) * sum(col("__c"))).as("__m2"))
    anovaCore(base.join(med2, Seq("__arm"))
      .select(col("__arm"),
        abs(col("__c") * 2L - col("__m2")).as("__c")))
  }

  /** Welch's heteroscedastic one-way ANOVA (Welch 1951) — the k-arm
    * mean test that does NOT pool variances: the fallback when
    * [[brownForsythe]] rejects [[anovaF]]'s equal-spread assumption.
    * With `w_i = n_i/s_i²`, `m̄ = Σw_i m_i / W`:
    * `F* = [Σw_i(m_i − m̄)²/(k−1)] / [1 + 2(k−2)/(k²−1)·Λ]`,
    * `Λ = Σ(1 − w_i/W)²/(n_i − 1)`, `df₂ = (k²−1)/(3Λ)`.
    *
    * Same execution as [[anovaF]]: ONE partial-agg pass to the k-row
    * arm table of exact integer-grid moments; every Σ above is an
    * arm-ORDERED fold over the collected bounded struct list (four
    * chained folds — W, m̄, the numerator, Λ), one tree at the
    * readout. Returns `(n_total, k_arms, df1, df2, f_stat)`; null
    * F/df2 when any arm has n < 2 or zero variance (w undefined), or
    * k < 2. F and df₂ are ratios — scale-invariant, so no rescale.
    */
  def welchAnova(units: DataFrame, armCol: String, idCol: String,
      yCol: String, scale: Int = 2): DataFrame = {
    import graft.functions.Grid
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val p = math.pow(10.0, scale)
    val arms = units
      .filter(col(yCol).isNotNull)
      .select(col(armCol).cast("string").as("__arm"),
        floor(col(yCol).cast("double") * p + 0.5).cast("long")
          .as("__c"))
      .groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__c").cast("decimal(38,0)")).as("__s"),
        sum(col("__c").cast("decimal(19,0)") * col("__c")).as("__q"))
      .select(col("__arm"), col("__n"),
        col("__n").cast("double").as("__nd"),
        (col("__s").cast("double") / col("__n").cast("double"))
          .as("__m"),
        // n = 1 would divide by zero under ANSI — null v there (the
        // degeneracy guard below nulls the outputs anyway)
        when(col("__n") >= 2L,
          (col("__q").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") /
              col("__n").cast("double")) /
            (col("__n").cast("double") - 1.0)).as("__v"))
      // the Welch weight, precomputed so no fold divides by a zero
      // variance under ANSI (null weight → null fold → null output;
      // the VALUE is the same nd/v double the oracle computes inline)
      .withColumn("__w",
        when(col("__v") > 0.0,
          col("__nd") / col("__v")))
    val one = arms.agg(
      sum(col("__n")).as("n_total"),
      count(lit(1)).as("k_arms"),
      min(col("__n")).as("__minN"),
      min(when(col("__n") >= 2L, col("__v"))).as("__minV"),
      expr("sort_array(collect_list(struct(__arm, __nd, __m, __w)))")
        .as("__l"))
    val kD = col("k_arms").cast("double")
    one
      .withColumn("__W", expr("aggregate(__l, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + x.__w)"))
      .withColumn("__mb", expr("aggregate(__l, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + x.__w * x.__m)") / col("__W"))
      .withColumn("__A", expr("aggregate(__l, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + x.__w * (x.__m - __mb) * " +
        "(x.__m - __mb))") / (kD - 1.0))
      .withColumn("__L", expr("aggregate(__l, CAST(0.0 AS DOUBLE), " +
        "(a, x) -> a + (1.0D - x.__w / __W) * " +
        "(1.0D - x.__w / __W) / (x.__nd - 1.0D))"))
      .withColumn("__ok", col("k_arms") >= 2L && col("__minN") >= 2L &&
        col("__minV") > 0.0 && col("__L") > 0.0)
      .select(col("n_total"), col("k_arms"),
        (col("k_arms") - 1L).as("df1"),
        Grid.snap(when(col("__ok"),
          (kD * kD - 1.0) / (lit(3.0) * col("__L"))), 4).as("df2"),
        Grid.snap(when(col("__ok"),
          col("__A") / (lit(1.0) + lit(2.0) * (kD - 2.0) /
            (kD * kD - 1.0) * col("__L"))), 4).as("f_stat"))
  }

  /** All pairwise Welch z contrasts over the k-bounded arm table —
    * the post-hoc step after [[anovaF]]/[[welchAnova]] rejects the
    * global null ("the means differ" → "WHICH pairs differ"): per
    * unordered arm pair the Welch z from the same exact integer-grid
    * moments, z rounded at 4 then the normal two-sided p
    * ([[Multiplicity.normalTwoSidedP]] — the q248 convention). Feed
    * the result to [[Multiplicity.holmBonferroni]] for the
    * familywise-safe verdict set.
    *
    * One moment aggregation + one broadcast self-join of the k-row
    * arm table (k²/2 pairs, config-bounded). Returns
    * `(pair, arm_a, arm_b, n_a, n_b, diff, z, p)`; z nulls when
    * either side has n < 2 or both variances are zero.
    */
  def pairwiseWelch(units: DataFrame, armCol: String, yCol: String,
      scale: Int = 2): DataFrame = {
    require(scale >= 0 && scale <= 6, s"bad scale $scale")
    val p = math.pow(10.0, scale)
    val arms = units
      .filter(col(yCol).isNotNull)
      .select(col(armCol).cast("string").as("__arm"),
        floor(col(yCol).cast("double") * p + 0.5).cast("long")
          .as("__c"))
      .groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__c").cast("decimal(38,0)")).as("__s"),
        sum(col("__c").cast("decimal(19,0)") * col("__c")).as("__q"))
      .select(col("__arm"), col("__n"),
        (col("__s").cast("double") / col("__n").cast("double"))
          .as("__m"),
        // n = 1 divides by zero under ANSI — null v, which nulls the
        // pair's z below (n < 2 is the documented degenerate)
        when(col("__n") >= 2L,
          (col("__q").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") /
              col("__n").cast("double")) /
            (col("__n").cast("double") - 1.0)).as("__v"))
    val a = arms.select(col("__arm").as("arm_a"), col("__n").as("n_a"),
      col("__m").as("__ma"), col("__v").as("__va"))
    val b = arms.select(col("__arm").as("arm_b"), col("__n").as("n_b"),
      col("__m").as("__mb"), col("__v").as("__vb"))
    val se2 = col("__va") / col("n_a").cast("double") +
      col("__vb") / col("n_b").cast("double")
    val z = round((col("__ma") - col("__mb")) / sqrt(se2), 4)
    a.join(broadcast(b), col("arm_a") < col("arm_b"))
      .select(concat(col("arm_a"), lit("|"), col("arm_b")).as("pair"),
        col("arm_a"), col("arm_b"), col("n_a"), col("n_b"),
        // diff back in y units: one exact division of the mean gap
        graft.functions.Grid.snap(
          (col("__ma") - col("__mb")) / p, 4).as("diff"),
        when(col("n_a") >= 2L && col("n_b") >= 2L && se2 > 0.0, z)
          .as("z"))
      .withColumn("p", Multiplicity.normalTwoSidedP(col("z")))
  }

  /** Friedman test (1937) — the k-treatment repeated-measures rank
    * test: within each BLOCK (subject) the k arm values take midranks,
    * and the tie-adjusted statistic (Conover 1999's form)
    * `χ² = (k−1)·(Σ_j R_j² − n²k(k+1)²/4) / (Σ_{bj} r_{bj}² − nk(k+1)²/4)`
    * refers to χ²(k−1). The paired generalization [[kruskalWallis]]
    * can't express: each block is its own stratum, so between-block
    * spread cancels entirely.
    *
    * Contract: `df` holds ONE row per (block, arm) — the caller
    * aggregates to that grain first. Blocks missing any arm DROP
    * (complete-block design); `k` is the global distinct-arm count.
    * Midranks come from a BLOCK-keyed window (bounded: k rows per
    * block), doubled so ties stay integral; both quadratic sums
    * accumulate as DECIMAL(38,0) (R_j ~ n·2k: its square overflows a
    * long past n ~ 10⁸·k⁻¹). Returns one row `(n_blocks, k_arms, df,
    * chi2, kendall_w)`; `chi2` nulls when every block is fully tied.
    */
  def friedman(df: DataFrame, blockCol: String, armCol: String,
      yCol: String): DataFrame = {
    import graft.functions.Grid
    val base = df
      .filter(col(yCol).isNotNull)
      .select(col(blockCol).cast("string").as("__b"),
        col(armCol).cast("string").as("__arm"),
        col(yCol).cast("double").as("__y"))
    val k = base.agg(countDistinct(col("__arm")).as("k_arms"))
    val complete = base
      .withColumn("__kb", count(lit(1)).over(
        Window.partitionBy(col("__b"))))
      .crossJoin(broadcast(k))
      .filter(col("__kb") === col("k_arms"))
    val ranked = complete
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__b"))
          .orderBy(col("__y"), col("__arm"))))
      .withColumn("__r2",
        min(col("__rn")).over(
          Window.partitionBy(col("__b"), col("__y"))) +
        max(col("__rn")).over(
          Window.partitionBy(col("__b"), col("__y"))))
    val perArm = ranked.groupBy(col("k_arms"), col("__arm"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__r2").cast("decimal(38,0)")).as("__R2"))
    val folded = perArm.groupBy(col("k_arms"))
      .agg(max(col("__n")).as("n_blocks"),
        sum(col("__R2") * col("__R2")).as("__sr2"))
    val cellSq = ranked.agg(
      sum((col("__r2").cast("decimal(19,0)") * col("__r2")))
        .as("__a2"))
    val kD = col("k_arms").cast("double")
    val nD = col("n_blocks").cast("double")
    // doubled-rank algebra: Σ_j R_j² = __sr2/4 and Σ r² = __a2/4 —
    // the /4 cancels between numerator and denominator, leaving the
    // doubled identity χ² = (k−1)(__sr2 − n²k(2(k+1))²/4)/(__a2 − ...)
    // ... expand: with R2 = 2R, num = (ΣR2² − n²k(k+1)²·4/4·...) —
    // cleanest as doubles: terms below use the un-doubled formula on
    // __sr2/4 and __a2/4 directly (each one exact-decimal cast)
    val sumRsq = col("__sr2").cast("double") / 4.0
    val a2 = col("__a2").cast("double") / 4.0
    val num = sumRsq - nD * nD * kD * (kD + 1.0) * (kD + 1.0) / 4.0
    val den = a2 - nD * kD * (kD + 1.0) * (kD + 1.0) / 4.0
    val chi2 = (kD - 1.0) * num / den
    folded.crossJoin(broadcast(cellSq))
      .select(col("n_blocks"), col("k_arms"),
        (col("k_arms") - 1L).as("df"),
        Grid.snap(when(col("n_blocks") > 0L && den > 0.0, chi2), 4)
          .as("chi2"),
        Grid.snap(when(col("n_blocks") > 0L && den > 0.0 &&
          nD * (kD - 1.0) > 0.0, chi2 / (nD * (kD - 1.0))), 6)
          .as("kendall_w"))
  }

  /** Cochran's Q (1950) — the k-treatment test for PAIRED BINARY
    * outcomes, completing the repeated-measures family: [[mcNemar]]
    * is its k = 2 special case, [[friedman]] the continuous
    * generalization. With block row-sums `R_i`, treatment column-sums
    * `C_j`, grand total `T`:
    * `Q = (k−1)·Σ_j(kC_j − T)² / (k·(kT − Σ_i R_i²))` (the textbook
    * form carried ×k² so everything stays integer until ONE
    * division), referred to χ²(k−1).
    *
    * Contract: `df` holds one row per (block, arm) with a 0/1 `xCol`;
    * MISSING (block, arm) cells read as 0 (the full grid is completed
    * by a broadcast cross with the bounded arm list — all-0 and all-1
    * blocks are harmless, they cancel exactly in both numerator and
    * denominator). Quadratic sums accumulate as DECIMAL(38,0).
    * Returns one row `(n_blocks, k_arms, df, q_stat)`; `q_stat`
    * nulls when the denominator is 0 (every block constant).
    */
  def cochranQ(df: DataFrame, blockCol: String, armCol: String,
      xCol: String): DataFrame = {
    import graft.functions.Grid
    val base = df
      .filter(col(xCol).isNotNull)
      .select(col(blockCol).cast("string").as("__b"),
        col(armCol).cast("string").as("__arm"),
        when(col(xCol).cast("long") =!= 0L, 1L).otherwise(0L)
          .as("__x"))
    val armList = base.select(col("__arm")).distinct()
    val grid = base.select(col("__b")).distinct()
      .crossJoin(broadcast(armList))
    val full = grid.join(base, Seq("__b", "__arm"), "left")
      .na.fill(0L, Seq("__x"))
    val rows = full.groupBy(col("__b"))
      .agg(sum(col("__x")).as("__R"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("__R").cast("decimal(19,0)") * col("__R"))
          .as("__sR2"),
        sum(col("__R").cast("decimal(38,0)")).as("__T"))
    val cols = full.groupBy(col("__arm"))
      .agg(sum(col("__x")).as("__C"))
      .agg(count(lit(1)).as("k_arms"),
        expr("sort_array(collect_list(struct(__arm, __C)))")
          .as("__cl"))
    // Σ(kC_j − T)²: exact decimal terms folded in arm order (each
    // term < (kT)² — DECIMAL(38,0) holds k·10⁹ blocks comfortably)
    rows.crossJoin(broadcast(cols))
      .withColumn("__num", expr("aggregate(__cl, " +
        "CAST(0 AS DECIMAL(38,0)), (a, x) -> a + " +
        "CAST((k_arms * x.__C - __T) AS DECIMAL(19,0)) * " +
        "(k_arms * x.__C - __T))"))
      .withColumn("__den",
        col("k_arms").cast("decimal(38,0)") *
          (col("k_arms") * col("__T") - col("__sR2")))
      .select(col("n_blocks"), col("k_arms"),
        (col("k_arms") - 1L).as("df"),
        Grid.snap(when(col("__den") > 0,
          (col("k_arms") - 1L).cast("double") *
            col("__num").cast("double") / col("__den").cast("double")),
          4).as("q_stat"))
  }

  /** Inverse standard-normal CDF — Acklam's (2003) rational
    * approximation (|rel err| < 1.15e-9; public algorithm), used
    * DRIVER-side only: experiment planning needs z-quantiles and SQL
    * has no closed form, so the z's compute here and ship into plans
    * as [[graft.functions.Grid.lit17]] constants.
    */
  def inverseNormalCdf(p: Double): Double = {
    require(p > 0 && p < 1, s"p out of (0,1): $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q +
        c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r +
        a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      -inverseNormalCdf(1 - p)
    }
  }

  /** Experiment power planning — the sample-size sheet a growth team
    * reads before launching: for each metric key and each RELATIVE
    * minimum-detectable-effect in `mdes`, the per-arm n a two-sided
    * two-sample z-test needs: `n = ⌈2(z_{1−α/2}+z_{power})²σ̂²/δ²⌉`
    * with `δ = mde·μ̂` (van Belle's workhorse). μ̂/σ̂ from explicit
    * sums; z's via [[inverseNormalCdf]] shipped as lit17 constants;
    * outputs snap. One aggregation per key, a bounded mde explode.
    * Returns `(key, mde, n_obs, mean, sigma, delta, n_per_arm)`.
    */
  def powerAnalysis(df: DataFrame, keyCol: String, valueCol: String,
      mdes: Seq[Double], alpha: Double = 0.05,
      power: Double = 0.8): DataFrame = {
    require(mdes.nonEmpty && mdes.size <= 32 &&
      mdes.forall(m => m > 0 && m < 10), s"bad mdes $mdes")
    require(alpha > 0 && alpha < 0.5, s"bad alpha $alpha")
    require(power > 0.5 && power < 1, s"bad power $power")
    import graft.functions.Grid
    val za = inverseNormalCdf(1 - alpha / 2)
    val zb = inverseNormalCdf(power)
    val fac = Grid.lit17(2.0 * (za + zb) * (za + zb))
    val y = col(valueCol).cast("double")
    df.filter(y.isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"), sum(y).as("__sy"),
        sum(y * y).as("__syy"))
      .filter(col("n_obs") >= 2)
      .withColumn("mean", Grid.snap(col("__sy") / col("n_obs")))
      // clamp at 0 (the ewmaControl rationale): cancellation noise
      // must not reach sqrt as a tiny negative
      .withColumn("sigma", Grid.snap(sqrt(greatest(lit(0.0),
        (col("__syy") - col("__sy") * col("__sy") / col("n_obs")) /
          (col("n_obs") - 1)))))
      .withColumn("mde",
        explode(array(mdes.map(m => lit(Grid.snapD(m))): _*)))
      .withColumn("delta", Grid.snap(col("mde") * col("mean")))
      // a zero-mean metric has no relative MDE: null, never an ANSI
      // overflow ceiling the Inf division
      .withColumn("n_per_arm", when(col("delta") =!= 0.0, ceil(expr(
        s"$fac * sigma * sigma / (delta * delta)")).cast("long")))
      .select(col(keyCol), col("mde"), col("n_obs"), col("mean"),
        col("sigma"), col("delta"), col("n_per_arm"))
  }

  /** Wald's SPRT (1945) on a Bernoulli stream — the SEQUENTIAL arm of
    * the experimentation family: instead of a fixed-n test, each
    * key's ordered outcomes accumulate the log-likelihood ratio
    * `llr += ln(p1/p0)` on success, `ln((1−p1)/(1−p0))` on failure,
    * and the walk stops the moment it crosses `ln((1−β)/α)` (reject
    * H0: p = p0) or `ln(β/(1−α))` (accept H0) — the always-valid
    * stopping the peeking-on-a-z-test anti-pattern lacks.
    *
    * Execution: one groupBy collects each key's ordered outcome list;
    * the walk is an aggregate HOF fold (per-key sequential state in
    * codegen, keys parallel). The four log constants are DRIVER-side
    * doubles stamped into the plan — an oracle embedding the same
    * 17-digit literals replays the walk bit-exactly, and the llr
    * re-snaps per step on the [[graft.functions.Grid]]. State freezes
    * at the decision (later outcomes don't move a decided walk).
    * Returns `(key, n_total, n_success, decision, n_at_decision,
    * llr_final)` — decision ∈ reject_h0 | accept_h0 | continue.
    */
  def sprt(df: DataFrame, keyCol: String, orderCol: String,
      successCol: String, p0: Double, p1: Double, alpha: Double,
      beta: Double): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"bad hypotheses p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 0.5 && beta > 0 && beta < 0.5,
      s"bad error rates alpha=$alpha beta=$beta")
    import graft.functions.Grid.lit17
    val la = math.log(p1 / p0)
    val lb = math.log((1 - p1) / (1 - p0))
    val up = math.log((1 - beta) / alpha)
    val lo = math.log(beta / (1 - alpha))
    val step = graft.functions.Grid.snapSql(
      s"acc.llr + IF(x.s, ${lit17(la)}, ${lit17(lb)})")
    df.filter(col(orderCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col(successCol), 1L).otherwise(0L)).as("n_success"),
        sort_array(collect_list(struct(
          col(orderCol).cast("long").as("o"),
          // null outcome = failure (the CASE ELSE convention) — an
          // unguarded null would poison the whole walk through IF
          coalesce(col(successCol).cast("boolean"), lit(false))
            .as("s")))).as("__w"))
      .withColumn("__st", expr(
        s"""aggregate(__w,
           |  named_struct('llr', CAST(0.0 AS DOUBLE), 'n', 0L,
           |    'dec', 0),
           |  (acc, x) -> IF(acc.dec <> 0, acc,
           |    named_struct(
           |      'llr', $step,
           |      'n', acc.n + 1L,
           |      'dec', IF(($step) >= ${lit17(up)}, 1,
           |        IF(($step) <= ${lit17(lo)}, -1, 0)))))"""
          .stripMargin))
      .select(col(keyCol), col("n_total"), col("n_success"),
        when(col("__st.dec") === 1, "reject_h0")
          .when(col("__st.dec") === -1, "accept_h0")
          .otherwise("continue").as("decision"),
        when(col("__st.dec") =!= 0, col("__st.n")).otherwise(lit(-1L))
          .as("n_at_decision"),
        col("__st.llr").as("llr_final"))
  }

  /** RESUME a [[sprt]] from its persisted output: each key's new
    * outcomes (strictly later than the state's horizon) continue the
    * walk from the stored llr — or pass straight through when the
    * walk already DECIDED (decisions are final; that is the point of
    * a sequential test). Left fold ⇒ `resume(sprt(A), B) ==
    * sprt(A ++ B)` EXACTLY (spec'd); debut keys start fresh. The
    * [[graft.operators.Forecast.holtLinearFrom]] carry for the
    * experimentation family.
    */
  def sprtFrom(df: DataFrame, keyCol: String, orderCol: String,
      successCol: String, state: DataFrame, p0: Double, p1: Double,
      alpha: Double, beta: Double): DataFrame = {
    import graft.functions.Grid.lit17
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      s"bad hypotheses p0=$p0 p1=$p1")
    require(alpha > 0 && alpha < 0.5 && beta > 0 && beta < 0.5,
      s"bad error rates alpha=$alpha beta=$beta")
    val la = math.log(p1 / p0)
    val lb = math.log((1 - p1) / (1 - p0))
    val up = math.log((1 - beta) / alpha)
    val lo = math.log(beta / (1 - alpha))
    val step = graft.functions.Grid.snapSql(
      s"acc.llr + IF(x.s, ${lit17(la)}, ${lit17(lb)})")
    val st = state.select(col(keyCol), col("n_total").as("__pn"),
      col("n_success").as("__ps"),
      when(col("decision") === "reject_h0", 1)
        .when(col("decision") === "accept_h0", -1).otherwise(0)
        .as("__pd"),
      col("n_at_decision").as("__pnd"), col("llr_final").as("__pl"))
    val series = df.filter(col(orderCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("__bn"),
        sum(when(col(successCol), 1L).otherwise(0L)).as("__bs"),
        sort_array(collect_list(struct(
          col(orderCol).cast("long").as("o"),
          coalesce(col(successCol).cast("boolean"), lit(false))
            .as("s")))).as("__w"))
    val resumed = series.join(st, Seq(keyCol))
      .withColumn("__st", expr(
        s"""aggregate(__w,
           |  named_struct('llr', __pl,
           |    'n', __pn,
           |    'dec', __pd),
           |  (acc, x) -> IF(acc.dec <> 0, acc,
           |    named_struct(
           |      'llr', $step,
           |      'n', acc.n + 1L,
           |      'dec', IF(($step) >= ${lit17(up)}, 1,
           |        IF(($step) <= ${lit17(lo)}, -1, 0)))))"""
          .stripMargin))
      .select(col(keyCol), (col("__pn") + col("__bn")).as("n_total"),
        (col("__ps") + col("__bs")).as("n_success"),
        when(col("__st.dec") === 1, "reject_h0")
          .when(col("__st.dec") === -1, "accept_h0")
          .otherwise("continue").as("decision"),
        when(col("__pd") =!= 0, col("__pnd"))
          .when(col("__st.dec") =!= 0, col("__st.n"))
          .otherwise(lit(-1L)).as("n_at_decision"),
        col("__st.llr").as("llr_final"))
    val idle = st.join(series.select(col(keyCol)), Seq(keyCol),
        "left_anti")
      .select(col(keyCol), col("__pn").as("n_total"),
        col("__ps").as("n_success"),
        when(col("__pd") === 1, "reject_h0")
          .when(col("__pd") === -1, "accept_h0")
          .otherwise("continue").as("decision"),
        col("__pnd").as("n_at_decision"), col("__pl").as("llr_final"))
    val fresh = sprt(
      df.join(st.select(col(keyCol)), Seq(keyCol), "left_anti"),
      keyCol, orderCol, successCol, p0, p1, alpha, beta)
    resumed.unionByName(idle).unionByName(fresh)
  }
}
