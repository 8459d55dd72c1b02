package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture budgeting — the corpus-assembly step that turns target source
  * weights into per-source token allocations under a total budget:
  * allocate `weight_s · T` tokens to each source, except that no source
  * can give more than it has (`capacity_s`); the water-filling level `T`
  * is chosen so allocations sum exactly to the budget, with saturated
  * sources' unused share redistributed to the rest. This is the exact
  * solve behind "mix 30% code, 50% web, 20% books" when some source
  * runs out.
  *
  * Algorithm (exact, one pass over the stratum table): sort sources by
  * `capacity/weight` ascending; a source saturates iff that ratio is
  * below the final level. Scanning in order, the candidate level at row
  * i is `(budget − Σ capacities before i) / Σ weights from i`; the FIRST
  * row whose ratio reaches its candidate fixes `T` (later candidates
  * wrongly assume unsaturated rows saturated — first, not min, is the
  * correct pick).
  *
  * 100 TB shape: the windows run over the STRATUM table — one row per
  * source/domain, bounded like the stratum-count facts in [[Sampling]] —
  * in a single ordered partition; the corpus-side capacity aggregation
  * upstream is the only distributed pass. All arithmetic is ordered
  * window sums + IEEE division, so an oracle replays it bit-for-bit.
  */
object Mixture {

  /** `strata` plus `alloc`: the water-filled allocation. `capacityCol`
    * integral, `weightCol` positive doubles (unnormalized is fine —
    * only ratios matter). If `budget ≥ Σ capacity`, every source
    * allocates its full capacity.
    */
  def waterfill(strata: DataFrame, keyCol: String, capacityCol: String,
      weightCol: String, budget: Double): DataFrame = {
    val order = Window.orderBy(col("__ratio"), col(keyCol))
    val before = order.rowsBetween(Window.unboundedPreceding, -1)
    val fromHere = order.rowsBetween(Window.currentRow,
      Window.unboundedFollowing)
    val full = order.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    strata
      .withColumn("__cap", col(capacityCol).cast("double"))
      .withColumn("__ratio", col("__cap") / col(weightCol))
      .withColumn("__cumBefore",
        coalesce(sum(col("__cap")).over(before), lit(0.0)))
      .withColumn("__tailW", sum(col(weightCol)).over(fromHere))
      .withColumn("__tcand",
        (lit(budget) - col("__cumBefore")) / col("__tailW"))
      .withColumn("__tstar",
        first(when(col("__ratio") >= col("__tcand"), col("__tcand")),
          ignoreNulls = true).over(full))
      .withColumn("alloc",
        when(col("__tstar").isNull, col("__cap")) // budget >= total
          // clamp at 0: a budget below even the first stratum's share
          // yields a negative level, which must mean "allocate nothing",
          // never a negative allocation
          .otherwise(greatest(lit(0.0),
            least(col("__cap"), col(weightCol) * col("__tstar")))))
      .drop("__cap", "__ratio", "__cumBefore", "__tailW", "__tcand",
        "__tstar")
  }
}
