package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weight-of-evidence / information-value feature screening — the
  * classic credit-scoring readout for "which categorical features
  * separate a binary label, and how does each level lean":
  *
  *   woe(bin)  = ln( (pos_bin + α)/(P + 2α) ) −
  *               ln( (neg_bin + α)/(N + 2α) )
  *   iv(feat)  = Σ_bins (p_bin − q_bin) · woe(bin)
  *
  * with additive smoothing α so empty cells stay finite (Laplace on
  * both classes keeps woe's sign meaningful at α→0).
  *
  * Shape at scale: features MELT into (feature, value) rows — one
  * narrow shuffle at (feature × distinct-value) grain, never a pass
  * per feature; per-feature totals are a feature-bounded broadcast.
  * The IV sum folds over each feature's SORTED bin list with a 1e-6
  * re-round per step (bins per feature are config-bounded — this is
  * the ordered-fold portability device, not a corpus-sized collect),
  * so the statistic replays bit-exactly in any engine.
  */
object Woe {

  /** Bin-grain WOE table: one row per (feature, value) with counts,
    * distribution shares, and woe — plus the feature's iv on every
    * row (the screening readout wants both grains together). `labelCol`
    * must be boolean; feature values stringify (null → "__null__").
    */
  def woeTable(df: DataFrame, featureCols: Seq[String],
      labelCol: String, alpha: Double = 0.5): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val melted = df.select(
      explode(array(featureCols.map(f => struct(
        lit(f).as("feature"),
        coalesce(col(f).cast("string"), lit("__null__")).as("value")
      )): _*)).as("fv"),
      col(labelCol).cast("boolean").as("__y"))
      .select(col("fv.feature").as("feature"),
        col("fv.value").as("value"), col("__y"))
    val bins = melted.groupBy(col("feature"), col("value"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__y"), 0L).otherwise(1L)).as("n_neg"))
    val tots = bins.groupBy(col("feature"))
      .agg(sum(col("n_pos")).as("__tp"), sum(col("n_neg")).as("__tn"))
    val a = lit(alpha)
    val scored = bins.join(broadcast(tots), Seq("feature"))
      .withColumn("p_share", round((col("n_pos") + a) /
        (col("__tp") + a * 2), 6))
      .withColumn("q_share", round((col("n_neg") + a) /
        (col("__tn") + a * 2), 6))
      .withColumn("woe", round(
        log((col("n_pos") + a) / (col("__tp") + a * 2)) -
          log((col("n_neg") + a) / (col("__tn") + a * 2)), 6))
      .withColumn("__term",
        round((col("p_share") - col("q_share")) * col("woe"), 6))
    // iv: ordered fold over the feature's bin list (bounded), one
    // ENGINE-EXACT snap per step (round() ties are engine-dependent —
    // the q253/q254 divergence class; oracle runs the same program)
    val iv = scored.groupBy(col("feature"))
      .agg(sort_array(collect_list(struct(col("value"),
        col("__term").as("t")))).as("__bins"))
      .withColumn("iv", graft.functions.Grid.snap(aggregate(col("__bins"),
        lit(0.0), (acc, x) => graft.functions.Grid.snap(acc + x("t"))), 4))
      .select(col("feature"), col("iv"))
    scored.join(broadcast(iv), Seq("feature"))
      .select(col("feature"), col("value"), col("n_pos"), col("n_neg"),
        col("p_share"), col("q_share"), col("woe"), col("iv"))
  }

  /** Feature-grain ranking: `(feature, n_bins, iv)` sorted by iv
    * descending — the screening shortlist. Same fold as [[woeTable]].
    */
  def ivRanking(df: DataFrame, featureCols: Seq[String],
      labelCol: String, alpha: Double = 0.5): DataFrame =
    woeTable(df, featureCols, labelCol, alpha)
      .groupBy(col("feature"))
      .agg(count(lit(1)).as("n_bins"), first(col("iv")).as("iv"))
      .orderBy(col("iv").desc, col("feature"))

  /** WOE over a NUMERIC feature: quantile bins from the exact
    * nearest-rank cuts computed on the value HISTOGRAM (one
    * aggregation to the distinct-value table, a cumsum at value
    * grain — the gridded-metric contract shared with
    * [[Abtest.ksTest]]; pre-quantize continuous data), then
    * [[woeTable]] on the bin label. Completes the screening family:
    * q260 reads categorical features, this reads measures.
    */
  def woeNumericGrid(df: DataFrame, numCol: String, labelCol: String,
      percents: Seq[Int] = Seq(25, 50, 75),
      alpha: Double = 0.5): DataFrame = {
    require(percents.nonEmpty &&
      percents.forall(p => p >= 1 && p <= 99), s"bad cuts $percents")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(numCol).cast("double")
    val hist = df.filter(v.isNotNull).groupBy(v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val tot = hist.agg(sum(col("__c")).as("__n"))
    val pcts = percents.distinct.sorted.toDF("pct")
    // cumulative counts via the ordered prefix scan (exact integer
    // sums, no unpartitioned window over the value grid)
    val cuts = Ranks.withOrderedPrefixScan(
        hist.crossJoin(broadcast(tot)), Seq(col("__v")),
        Seq("__c" -> "__cum"))
      .crossJoin(broadcast(pcts))
      .filter(col("__cum") >= expr("(pct * __n + 99) DIV 100"))
      .groupBy(col("pct")).agg(min(col("__v")).as("cut"))
    val binned = df.filter(v.isNotNull)
      .crossJoin(broadcast(cuts.agg(
        sort_array(collect_list(col("cut"))).as("__cuts"))))
      .withColumn("vbin", concat(lit("q"),
        (aggregate(col("__cuts"), lit(0),
          (acc, c) => acc + when(v > c, 1).otherwise(0)) + 1)
          .cast("string")))
    woeTable(binned, Seq("vbin"), labelCol, alpha)
  }

  /** Leave-one-out target encoding with prior smoothing — the
    * gradient-boosting feature trick done WITHOUT leakage: each row's
    * encoding of its category excludes its OWN target,
    *
    *   te = (Σ_g y − y_row + m·μ) / (n_g − 1 + m)
    *
    * (μ = global target mean, m = prior strength), so the encoded
    * column carries no direct copy of the row's label — naive mean
    * encoding memorizes singletons and leaks the answer into
    * training. Adds `te` to every row.
    *
    * Scale shape: one aggregation to the |distinct categories| stats
    * table, joined back on the category (AQE broadcasts when it
    * fits); μ is a broadcast 1-row frame. μ and te round at 1e-6 so
    * the encoding replays in any engine.
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
      m: Double = 20.0): DataFrame = {
    require(m > 0, s"prior strength m must be positive, got $m")
    val y = col(targetCol).cast("double")
    val stats = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("__te_n"), sum(y).as("__te_sum"))
    val global = df.agg(
      round(sum(y) / count(lit(1)), 6).as("__te_mu"))
    df.join(stats, Seq(catCol))
      .crossJoin(broadcast(global))
      .withColumn("te", round(
        (col("__te_sum") - y + lit(m) * col("__te_mu")) /
          (col("__te_n").cast("double") - 1 + lit(m)), 6))
      .drop("__te_n", "__te_sum", "__te_mu")
  }
}
