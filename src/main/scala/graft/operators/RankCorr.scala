package graft.operators

import graft.functions.Grid
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spearman rank correlation per key — the robust, scale-free
  * monotone-association readout (outlier-immune where Pearson is
  * not). ρ = Pearson over MIDRANKS (tied values share the mean of
  * their positions — the standard tie treatment), computed per key.
  *
  * Engine-exact by construction: midranks are integers-or-halves, so
  * DOUBLED midranks are exact longs; all five Pearson sums accumulate
  * exact longs (order-free), convert once to double, and the ρ
  * formula is one fixed expression tree ([[Seasonal.crossCorrelation]]
  * discipline). Ranks come from KEYED windows only: row_number per
  * (key, metric order), midrank = the mean position among equal
  * values via a (key, value)-partitioned window — the q191 midrank
  * device, never a global sort.
  */
object RankCorr {

  /** Kendall's τ-b per key — the pairwise companion to
    * [[spearmanBy]]: over all observation pairs, `τ_b = (C − D) /
    * √((n₀ − t_x)(n₀ − t_y))` with C/D the concordant/discordant
    * counts and t the tie-pair counts per side (n₀ = n(n−1)/2). More
    * robust to a few wild ranks than Spearman and directly
    * interpretable as P(concordant) − P(discordant).
    *
    * Engine-exact: every count is an exact long from one per-key
    * pair join (bounded by the [[Robust.theilSenTrend]]-style
    * `maxPoints` deterministic cap — pair space is O(n²), a
    * series/experiment-grain contract); one fixed float tree at the
    * snapped readout. Degenerate sides (all tied) read null.
    */
  def kendallTauBy(df: DataFrame, keyCol: String, xCol: String,
      yCol: String, maxPoints: Int = 1024): DataFrame = {
    require(maxPoints >= 2, s"bad maxPoints $maxPoints")
    val wp = Window.partitionBy(col("__k"))
      .orderBy(col("__x"), col("__y"))
    val pts = graft.CacheScope.register(df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol).as("__k"), col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
      .withColumn("__i", row_number().over(wp))
      .filter(col("__i") <= maxPoints)
      .persist())
    val sx = signum(col("b.__x") - col("a.__x"))
    val sy = signum(col("b.__y") - col("a.__y"))
    val counts = pts.as("a").join(pts.as("b"),
        col("a.__k") === col("b.__k") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__k").as("__k"))
      .agg(count(lit(1)).as("__n0"),
        sum(when(sx * sy > 0, 1L).otherwise(0L)).as("__c"),
        sum(when(sx * sy < 0, 1L).otherwise(0L)).as("__d"),
        sum(when(sx === 0 && sy =!= 0, 1L).otherwise(0L)).as("__tx0"),
        sum(when(sy === 0 && sx =!= 0, 1L).otherwise(0L)).as("__ty0"),
        sum(when(sx === 0 && sy === 0, 1L).otherwise(0L)).as("__tb"))
    val n = pts.groupBy(col("__k")).agg(count(lit(1)).as("n"))
    // Tx/Ty include both-tied pairs; (n0−Tx)(n0−Ty) stays an exact
    // long product at this cap (≤ (2^19)² ≪ 2^63)
    val fx = col("__n0") - (col("__tx0") + col("__tb"))
    val fy = col("__n0") - (col("__ty0") + col("__tb"))
    // left join from n: a single-observation key has no pairs and so
    // no counts row — it still appears in the output with zero pair
    // counts and a null tau_b (the [[spearmanBy]] null-on-degenerate
    // convention; an inner join would silently drop the key)
    n.join(counts, Seq("__k"), "left")
      .select(col("__k").as(keyCol), col("n"),
        coalesce(col("__c"), lit(0L)).as("n_concordant"),
        coalesce(col("__d"), lit(0L)).as("n_discordant"),
        Grid.snap(
          when(fx > 0L && fy > 0L,
            (col("__c") - col("__d")).cast("double") /
              sqrt((fx * fy).cast("double"))), 4).as("tau_b"))
  }

  /** Exactness bound: Σ(2·midrank)² ≈ 4n³/3 per key must fit a long,
    * so keys are capped at ~1.3M rows — series/experiment grain, the
    * operator's contract. The guard is distributive (one count
    * aggregation) and fails FAST rather than wrapping into a silent
    * garbage ρ.
    */
  def spearmanBy(df: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(keyCol).as("__k"), col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"))
    val maxN = base.groupBy(col("__k")).agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L))).head().getLong(0)
    require(maxN <= 1300000L,
      s"a key holds $maxN rows — beyond the exact-long rank-sum bound " +
        "(~1.3M); Spearman here is a series/experiment-grain device")
    def doubledMidrank(c: String): org.apache.spark.sql.Column = {
      val order = Window.partitionBy(col("__k")).orderBy(col(c))
      val ties = Window.partitionBy(col("__k"), col(c))
      // 2·midrank = 2·rank + tie_count − 1 (rank() = #smaller + 1 is
      // tie-order-free, so no row id is needed): exact longs
      (rank().over(order).cast("long") * 2L +
        count(lit(1)).over(ties) - 1L)
    }
    val ranked = base
      .withColumn("__rx", doubledMidrank("__x"))
      .withColumn("__ry", doubledMidrank("__y"))
    ranked.groupBy(col("__k"))
      .agg(count(lit(1)).as("n"),
        sum(col("__rx")).as("sx"), sum(col("__ry")).as("sy"),
        sum(col("__rx") * col("__rx")).as("sxx"),
        sum(col("__ry") * col("__ry")).as("syy"),
        sum(col("__rx") * col("__ry")).as("sxy"))
      .select(col("__k").as(keyCol), col("n"),
        Grid.snap(
          // a zero-variance side leaves rho undefined — null, never
          // an ANSI overflow on snapping the ±Inf/NaN division
          when(col("n") >= 2 &&
            col("n") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")
              =!= 0.0 &&
            col("n") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double")
              =!= 0.0,
            (col("n") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              sqrt((col("n") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
                (col("n") * col("syy").cast("double") -
                  col("sy").cast("double") * col("sy").cast("double")))),
          4).as("rho"))
  }
}
