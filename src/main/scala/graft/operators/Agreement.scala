package graft.operators

import graft.functions.Grid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement — the labeled-data QA family (Cohen
  * 1960; Artstein & Poesio 2008 for the NLP practice): when two
  * raters (humans, heuristics, or model judges) label the same items,
  * raw percent agreement flatters — kappa corrects for the agreement
  * two INDEPENDENT raters with the same marginals would reach by
  * chance: `κ = (p_o − p_e) / (1 − p_e)`.
  *
  * Execution shape: ONE aggregation collapses the labeled corpus to
  * the k×k confusion table (k = label alphabet, config-bounded);
  * everything downstream — marginals, chance agreement, weighted
  * variants — is integer arithmetic on that bounded table. All counts
  * and cross-products are exact longs (order-free), so the only float
  * ops are the final divisions, snapped on the [[Grid]]: the readout
  * is engine-exact by construction, no fold replay needed.
  */
object Agreement {

  /** Cohen's kappa plus the linear-WEIGHTED kappa (for ordinal
    * labels: disagreeing by one bucket is better than by three —
    * weight `w_ab = 1 − |a−b|/(k−1)` credits near-misses;
    * Cohen 1968). `ordinalCol(a)` must map each label to its 0-based
    * ordinal rank; for nominal labels pass distinct ordinals and read
    * only the unweighted kappa (the weighted one degenerates
    * gracefully but means nothing). Returns one row:
    * `(n_items, k_labels, po, pe, kappa, po_w, pe_w, kappa_w)`.
    *
    * Degenerate guard: a single-label alphabet has `p_e = 1`; kappa
    * is undefined and reads null rather than a division artifact.
    *
    * Exactness bound: each chance cross-product `ra·cb` is a long
    * product of two marginals (exact while every marginal stays below
    * 2^31, ~2.1 B rated items), and the chance SUMS — which reach
    * n²·(k−1), past 2^63 from n ≈ 2^28.5 with a wide alphabet —
    * accumulate as DECIMAL(38,0), exact to 1e38. Agreement audits are
    * annotation-sample grain, not corpus grain; shard the audit if a
    * single rater pair ever exceeds the marginal bound.
    */
  def cohenKappa(df: DataFrame, raterACol: String, raterBCol: String,
      maxLabels: Int = 64): DataFrame = {
    // the k×k confusion table — the ONE corpus-grain aggregation
    val conf = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(raterACol).cast("string").as("a"),
        col(raterBCol).cast("string").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("nab"))
    // label alphabet with 0-based ordinal rank (lexicographic — the
    // ordinal contract for the weighted form; callers with a domain
    // order should pre-map labels to sortable strings)
    val labels = conf.select(col("a").as("lab"))
      .unionAll(conf.select(col("b").as("lab"))).distinct()
    val nLabels = labels.count()
    require(nLabels >= 1 && nLabels <= maxLabels,
      s"label alphabet $nLabels outside [1, $maxLabels] — kappa is a " +
        "bounded-alphabet device")
    val ranked = Ranks.withOrderedPrefixScan(labels, Seq(col("lab")),
        Seq.empty, idxCol = "__r")
      .select(col("lab"), (col("__r") - 1L).as("ord"))
    // everything below runs on the bounded confusion table: exact
    // long counts, exact long cross-products, divisions only at the
    // readout. |k−1| scales through lw = (k−1) − |orda−ordb| so the
    // weighted sums stay integral: po_w = Σ nab·lw / (n·(k−1)).
    val cells = conf
      .join(ranked.select(col("lab").as("a"), col("ord").as("__oa")),
        Seq("a"))
      .join(ranked.select(col("lab").as("b"), col("ord").as("__ob")),
        Seq("b"))
      .withColumn("__lw", lit(nLabels - 1L) -
        abs(col("__oa") - col("__ob")))
    val margA = cells.groupBy(col("a")).agg(sum(col("nab")).as("ra"))
    val margB = cells.groupBy(col("b")).agg(sum(col("nab")).as("cb"))
    // chance table: every (a, b) marginal pair, weighted the same way
    val chance = margA.crossJoin(margB)
      .join(ranked.select(col("lab").as("a"), col("ord").as("__oa")),
        Seq("a"))
      .join(ranked.select(col("lab").as("b"), col("ord").as("__ob")),
        Seq("b"))
      .withColumn("__lw", lit(nLabels - 1L) -
        abs(col("__oa") - col("__ob")))
    val obs = cells.agg(
      sum(col("nab")).as("n"),
      sum(when(col("a") === col("b"), col("nab")).otherwise(0L))
        .as("agree"),
      sum(col("nab") * col("__lw")).as("agree_w"))
    // chance cross-products accumulate as DECIMAL(38,0): the weighted
    // sum reaches n²·(k−1), which blows through 2^63 from n ≈ 2^28.5
    // with a wide alphabet — a long accumulator would wrap silently
    // well inside the documented bound. Decimal stays exact to 1e38.
    val exp = chance.agg(
      sum(when(col("a") === col("b"),
        col("ra").cast("decimal(19,0)") *
          col("cb").cast("decimal(19,0)"))
        .otherwise(lit(0).cast("decimal(19,0)"))).as("echance"),
      sum(col("ra").cast("decimal(19,0)") *
        col("cb").cast("decimal(19,0)") * col("__lw"))
        .as("echance_w"))
    val km1 = if (nLabels > 1) nLabels - 1L else 1L
    // n² and n²·(k−1) in decimal too — the denominators overflow a
    // long at the same n ≈ 2^28.5 the accumulator does; the double
    // readout casts the same exact integer on every engine
    val nn = col("n").cast("decimal(19,0)") * col("n")
      .cast("decimal(19,0)")
    val nnk = nn * lit(km1).cast("decimal(10,0)")
    obs.crossJoin(exp)
      .select(
        col("n").as("n_items"),
        lit(nLabels).as("k_labels"),
        Grid.snap(col("agree").cast("double") / col("n")).as("po"),
        Grid.snap(col("echance").cast("double") /
          nn.cast("double")).as("pe"),
        Grid.snap(
          when(col("echance") === nn, lit(null))
            .otherwise((col("agree").cast("double") / col("n") -
              col("echance").cast("double") / nn.cast("double")) /
              (lit(1.0) - col("echance").cast("double") /
                nn.cast("double")))).as("kappa"),
        Grid.snap(col("agree_w").cast("double") / (col("n") * km1))
          .as("po_w"),
        Grid.snap(col("echance_w").cast("double") /
          nnk.cast("double")).as("pe_w"),
        Grid.snap(
          // k = 1 degenerates the WEIGHTED form differently (every
          // lw weight is 0, so the ratio reads a defined-looking 0):
          // null it explicitly, same contract as the unweighted kappa
          when(lit(nLabels) === 1L, lit(null))
            .when(col("echance_w") === nnk, lit(null))
            .otherwise((col("agree_w").cast("double") /
              (col("n") * km1) -
              col("echance_w").cast("double") /
                nnk.cast("double")) /
              (lit(1.0) - col("echance_w").cast("double") /
                nnk.cast("double")))).as("kappa_w"))
  }

  /** Fleiss' kappa (1971) — agreement among m raters per item (m
    * fixed, raters anonymous): `P_i = (Σ_c n_ic² − m)/(m(m−1))` is
    * item i's observed pairwise agreement, `P̄e = Σ_c p_c²` the chance
    * rate from the pooled category shares, `κ = (P̄ − P̄e)/(1 − P̄e)`.
    * The multi-judge form of [[cohenKappa]] — LLM-judge ensembles,
    * crowdsourced label QA.
    *
    * Execution: one aggregation to the (item, category) count table,
    * one more to the scalars — every numerator an exact long
    * (Σ n_ic², category totals, squared totals), divisions snapped at
    * the readout only. Items must carry EXACTLY the same rating count
    * (Fleiss' design): the operator fails fast otherwise (pre-slice
    * upstream — e.g. first-m per item — rather than silently mixing
    * denominators). Same 2^31 exactness bound as [[cohenKappa]].
    * Returns `(n_items, m_raters, k_labels, p_bar, p_e, kappa)`.
    */
  def fleissKappa(df: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val nic = df
      .filter(col(itemCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(itemCol).as("__it"),
        col(labelCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("__n"))
    val perItem = nic.groupBy(col("__it"))
      .agg(sum(col("__n")).as("__m"),
        sum(col("__n") * col("__n")).as("__s2"))
    val ms = perItem.select(col("__m")).distinct().collect()
    require(ms.length == 1,
      s"items carry ${ms.length} distinct rating counts — Fleiss " +
        "requires a fixed m; pre-slice (e.g. first-m per item)")
    val m = ms(0).getLong(0)
    require(m >= 2, s"need m >= 2 raters per item, got $m")
    val scalars = perItem.agg(
      count(lit(1)).as("n"),
      sum(col("__s2")).as("s2"))
    val cats = nic.groupBy(col("__c"))
      .agg(sum(col("__n")).as("__t"))
      .agg(count(lit(1)).as("k"),
        sum(col("__t") * col("__t")).as("tt"))
    // P̄  = (S2 − n·m) / (n·m·(m−1));  P̄e = Σt_c² / (n·m)²
    val pBar = (col("s2") - col("n") * m).cast("double") /
      (col("n") * m * (m - 1))
    val pE = col("tt").cast("double") / (col("n") * m * (col("n") * m))
    scalars.crossJoin(cats)
      .select(col("n").as("n_items"), lit(m).as("m_raters"),
        col("k").as("k_labels"),
        Grid.snap(pBar).as("p_bar"), Grid.snap(pE).as("p_e"),
        Grid.snap(when(col("tt") === col("n") * m * (col("n") * m),
          lit(null)).otherwise((pBar - pE) / (lit(1.0) - pE)))
          .as("kappa"))
  }

  /** Cronbach's alpha (1951) — internal-consistency reliability of a
    * k-item score battery (here: do a respondent's per-item scores
    * move together?): `α = k/(k−1) · (1 − Σᵢσ²ᵢ / σ²_total)`. The
    * survey/QA-battery reliability readout beside the rater kappas.
    *
    * Engine-exact by construction: with INTEGER item scores every
    * variance shares the `n(n−1)` denominator, so the ratio collapses
    * to exact-long sums — `Σσ²ᵢ/σ²_tot = (n·SSᵢ − SQᵢ)/(n·SST − SQT)`
    * where SSᵢ = ΣᵢΣᵤx², SQᵢ = Σᵢ(Σᵤx)², SST = ΣᵤT², SQT = (ΣᵤT)² —
    * one exact division at the readout. Missing (unit, item) cells
    * score 0 (the count-battery convention); `n` counts every unit
    * for every item. Items come from the data (bounded alphabet,
    * guarded). Returns `(n_units, k_items, var_ratio, alpha)`.
    */
  def cronbachAlpha(df: DataFrame, unitCol: String, itemCol: String,
      scoreCol: String, maxItems: Int = 256): DataFrame = {
    val cell = df
      .filter(col(unitCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(unitCol).as("__u"), col(itemCol).as("__i"))
      .agg(sum(col(scoreCol).cast("long")).as("__x"))
    val k = cell.agg(countDistinct(col("__i"))).head().getLong(0)
    require(k >= 2 && k <= maxItems,
      s"item alphabet $k outside [2, $maxItems]")
    // zero cells contribute nothing to SSi/SQi sums but EVERY unit
    // counts in n — so n comes from the unit table, not the cells
    val n = cell.select(col("__u")).distinct().count()
    require(n >= 2, s"need >= 2 units, got $n")
    val items = cell.groupBy(col("__i"))
      .agg(sum(col("__x")).as("__sx"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .agg(sum(col("__sxx")).as("ssi"),
        sum(col("__sx") * col("__sx")).as("sqi"))
    val totals = cell.groupBy(col("__u"))
      .agg(sum(col("__x")).as("__t"))
      .agg(sum(col("__t") * col("__t")).as("sst"),
        sum(col("__t")).as("st"))
    // zero total variance (all unit totals equal) leaves alpha
    // undefined — null, never an ANSI overflow on snapping ±Inf
    val ratio = when(lit(n) * col("sst") - col("st") * col("st") =!= 0L,
      (lit(n) * col("ssi") - col("sqi")).cast("double") /
        (lit(n) * col("sst") - col("st") * col("st")))
    items.crossJoin(totals)
      .select(lit(n).as("n_units"), lit(k).as("k_items"),
        Grid.snap(ratio).as("var_ratio"),
        Grid.snap(lit(k.toDouble / (k - 1)) * (lit(1.0) - ratio))
          .as("alpha"))
  }

  /** Per-label specific agreement over the same confusion table —
    * WHICH labels the raters fight about: positive specific agreement
    * `2·n_aa / (r_a + c_a)` per label (Dice of the two raters' label-a
    * sets), with both marginals. The drill-down kappa hides.
    */
  def labelAgreement(df: DataFrame, raterACol: String,
      raterBCol: String): DataFrame = {
    val conf = df
      .filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(raterACol).cast("string").as("a"),
        col(raterBCol).cast("string").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("nab"))
    val margA = conf.groupBy(col("a").as("label"))
      .agg(sum(col("nab")).as("n_rater_a"))
    val margB = conf.groupBy(col("b").as("label"))
      .agg(sum(col("nab")).as("n_rater_b"))
    val diag = conf.filter(col("a") === col("b"))
      .select(col("a").as("label"), col("nab").as("n_both"))
    margA.join(margB, Seq("label"), "full")
      .join(diag, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_rater_a"), lit(0L)).as("n_rater_a"),
        coalesce(col("n_rater_b"), lit(0L)).as("n_rater_b"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        Grid.snap(lit(2.0) * coalesce(col("n_both"), lit(0L)) /
          (coalesce(col("n_rater_a"), lit(0L)) +
            coalesce(col("n_rater_b"), lit(0L)))).as("specific_agreement"))
  }
}
