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
    *
    * `maxEpochs` is the oversampling dial of the standard data-mixture
    * recipe: a small high-quality source may be REPEATED up to
    * `maxEpochs` passes rather than capped at one, so its effective
    * capacity is `maxEpochs · capacity` (the saturation ratio becomes
    * `cap·maxEpochs / weight`) and `alloc` may exceed `capacity` up to
    * that bound. `maxEpochs = 1` (the default) is exactly the classic
    * fill — multiplication by 1 changes no IEEE bit. Realize a
    * repeated allocation with [[selectByAllocationsEpochs]], which
    * emits (doc, epoch) rows.
    */
  def waterfill(strata: DataFrame, keyCol: String, capacityCol: String,
      weightCol: String, budget: Double, maxEpochs: Int = 1): DataFrame = {
    require(maxEpochs >= 1, s"bad maxEpochs $maxEpochs")
    // The source table is config-bounded, so all the saturation-order
    // cumulation runs on the ordered prefix scan instead of global
    // windows. cumBefore comes DIRECTLY from the scan's exclusive
    // emission (the pre-increment accumulator — the shorter fold
    // itself) and the tail weight from a REVERSE scan: deriving them
    // by subtracting from inclusive sums is exact for integral
    // inputs but NOT the same float as the shorter fold once a
    // fractional off-grid weight appears. Scope of that exactness:
    // it holds SPARK-SIDE (this plan reproduces the canonical fold
    // bit-for-bit); the gated replay contract remains integer/grid
    // weights, because the DuckDB mirrors (q91/q96/q107) still read
    // cumB/tailW from float window-frame sums — a segment tree, not
    // this fold. Supporting off-grid fractional weights CROSS-ENGINE
    // would need the mirrors moved to the same exclusive/suffix fold
    // device. Both scans run over the bounded stratum table (one
    // deliberate task each).
    // PINNED: three branches consume the scan (tail scan, fill
    // level, final projection) — uncached each would re-run the
    // single-partition sort and the strata derivation above it
    val scanned = graft.CacheScope.register(Ranks.withOrderedPrefixScan(
      strata
        .withColumn("__cap", col(capacityCol).cast("double") * maxEpochs)
        .withColumn("__w", col(weightCol).cast("double"))
        .withColumn("__ratio", col("__cap") / col("__w")),
      Seq(col("__ratio"), col(keyCol)),
      Seq("__cap" -> "__cumC", "__w" -> "__cumW"), idxCol = "__i",
      exclSums = Seq("__cap" -> "__cumBefore"))
      .persist())
    // suffix weight = inclusive prefix of the DESC order — the exact
    // fold of the tail, no total-minus-prefix subtraction; joined
    // back by the stratum key (unique — one row per stratum)
    val tails = Ranks.withOrderedPrefixScan(
      scanned.select(col(keyCol), col("__ratio"), col("__w")),
      Seq(col("__ratio").desc, col(keyCol).desc),
      Seq("__w" -> "__tailW"))
      .select(col(keyCol), col("__tailW"))
    val leveled = scanned
      .join(broadcast(tails), Seq(keyCol))
      .withColumn("__tcand",
        (lit(budget) - col("__cumBefore")) / col("__tailW"))
    // the fill level: the FIRST stratum (in saturation order) whose
    // ratio meets its candidate level — a TakeOrdered(1), broadcast
    // back outer so a budget >= total (no such stratum) keeps rows
    val lvl = leveled.filter(col("__ratio") >= col("__tcand"))
      .orderBy(col("__ratio"), col(keyCol)).limit(1)
      .select(lit(1).as("__one"), col("__tcand").as("__tstar"))
    leveled
      .withColumn("__one", lit(1))
      .join(broadcast(lvl), Seq("__one"), "left")
      .withColumn("alloc",
        when(col("__tstar").isNull, col("__cap")) // budget >= total
          // clamp at 0: a budget below even the first stratum's share
          // yields a negative level, which must mean "allocate nothing",
          // never a negative allocation
          .otherwise(greatest(lit(0.0),
            least(col("__cap"), col("__w") * col("__tstar")))))
      .drop("__cap", "__w", "__ratio", "__cumC", "__cumW", "__i",
        "__totW", "__cumBefore", "__tailW", "__tcand", "__tstar",
        "__one")
  }

  /** Realize a [[waterfill]] allocation as an ACTUAL document pick: per
    * stratum, take documents in deterministic hash order until the
    * stratum's allocation is exhausted — no partial documents, the
    * boundary-bucket rule of [[CorpusSelection.selectByTokenBudget]]
    * applied per stratum.
    *
    * Scale shape — the same two-phase device as `selectByTokenBudget`,
    * with splitmix64 hash buckets playing the score grid:
    * per-(stratum, bucket) token totals are one partial-agg shuffle
    * cumulated driver-side (strata × `hashBuckets` rows — a bounded
    * fact, guarded below), whole buckets below each stratum's cutoff
    * are a plain filter, and only the ONE boundary bucket per stratum
    * pays a window — over ~1/`hashBuckets` of the stratum, never the
    * stratum itself. In-bucket order is `(splitmix64(id), id)`: stable,
    * engine-independent, no preference among documents (the allocation
    * already encodes the policy; the pick must only be fair and
    * replayable).
    *
    * `allocs` is the (keyCol, allocCol) stratum table ([[waterfill]]
    * output); fractional allocations floor to whole tokens; strata
    * absent from `allocs` select nothing. Invariants (spec'd): selected
    * token mass per stratum ≤ floor(alloc), and within the boundary
    * bucket the selection is the maximal hash-order prefix that fits.
    */
  def selectByAllocations(docs: DataFrame, idCol: String, keyCol: String,
      tokenCountCol: String, allocs: DataFrame, allocCol: String = "alloc",
      hashBuckets: Int = 64, maxStrata: Int = 10000): DataFrame = {
    import graft.expressions.HashExpressions
    require(hashBuckets >= 1, s"bad hashBuckets $hashBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    // the allocation table is stratum-bounded by construction, but guard
    // the collect anyway (one row past the cap detects overflow without
    // pulling an unbounded result — same device as selectByTokenBudget)
    val allocRows = allocs
      .select(col(keyCol).cast("string"), col(allocCol).cast("double"))
      .limit(maxStrata + 1).collect()
    require(allocRows.length <= maxStrata,
      s"more than $maxStrata strata in the allocation table - " +
        "selectByAllocations cumulates per-stratum facts driver-side")
    val budget: Map[String, Long] = allocRows
      .map(r => r.getString(0) -> math.floor(r.getDouble(1)).toLong).toMap
    // bucketed corpus view: referenced by the totals action, the
    // full-bucket filter, and the boundary window — scoped cache.
    // Null token counts are excluded outright (they cannot be budgeted;
    // sum() would skip them in totals but the bucket filters would then
    // admit them for free — the selectByTokenBudget contract)
    val base = graft.CacheScope.register(
      docs.filter(col(tokenCountCol).isNotNull)
        .withColumn("__mx_b",
          pmod(HashExpressions.splitmix64(col(idCol).cast("long")),
            lit(hashBuckets.toLong)).cast("int"))
        .persist())
    val totals = base
      .groupBy(col(keyCol).cast("string").as("__k"), col("__mx_b"))
      .agg(sum(col(tokenCountCol).cast("long")).as("t"))
      .limit(maxStrata * hashBuckets + 1).collect()
    require(totals.length <= maxStrata.toLong * hashBuckets,
      s"(stratum, bucket) table exceeded ${maxStrata.toLong * hashBuckets}" +
        " rows - raise maxStrata only if the stratum table really is " +
        "bounded")
    // per stratum: scan buckets ascending; the first bucket that would
    // overflow the budget is the boundary (cut = hashBuckets when
    // everything fits; buckets past the boundary are dropped whole)
    val cuts: Seq[(String, Int, Long)] = totals
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case (k, rows) =>
        val b = budget.getOrElse(k, 0L)
        var acc = 0L
        var cut = hashBuckets
        var rem = 0L
        var found = false
        rows.sortBy(_._2).foreach { case (_, bkt, t) =>
          if (!found) {
            if (acc + t <= b) acc += t
            else { cut = bkt; rem = b - acc; found = true }
          }
        }
        (k, cut, rem)
      }
    // stratum-bounded by the guard above — the broadcast is deliberate
    val cutDf = broadcast(cuts.toDF("__k", "__cutb", "__rem"))
    val joined = base.join(cutDf, base(keyCol).cast("string") === $"__k")
    val full = joined.filter(col("__mx_b") < col("__cutb"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(HashExpressions.splitmix64(col(idCol).cast("long")),
        col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.filter(col("__mx_b") === col("__cutb"))
      .withColumn("__cum", sum(col(tokenCountCol).cast("long")).over(w))
      .filter(col("__cum") <= col("__rem"))
      .drop("__cum")
    full.unionByName(boundary).drop("__k", "__cutb", "__rem", "__mx_b")
  }

  /** [[selectByAllocations]] for REPEATED allocations
    * ([[waterfill]] with `maxEpochs > 1`): emits (doc, `epoch`) rows.
    * Per stratum with capacity `cap` (its total token mass) and budget
    * `b = floor(alloc)`: every document repeats for the
    * `fe = min(b / cap, maxEpochs)` complete epochs (epoch 1..fe), and
    * the remainder `b − fe·cap` realizes as the usual hash-prefix pick
    * at epoch `fe + 1` — so "allocate 2.6× this source" means two full
    * passes plus a fair deterministic 0.6 prefix, the standard
    * oversample-small-quality-sources recipe.
    *
    * Scale shape is [[selectByAllocations]]'s exactly — the complete
    * epochs add ONE bounded explode (`sequence(1, fe)`, fe ≤ maxEpochs)
    * against the same cached base; per-stratum `cap`/`fe`/remainder are
    * driver arithmetic on the already-collected (stratum, bucket)
    * totals. Invariants (spec'd): no doc repeats more than `maxEpochs`
    * times; per-stratum selected mass ≤ floor(alloc); `maxEpochs = 1`
    * reproduces [[selectByAllocations]]'s row set with epoch ∈ {1}.
    * An allocation beyond `maxEpochs·cap` (not producible by
    * [[waterfill]], but expressible by a caller-built table) clamps to
    * `maxEpochs` complete epochs — the unsatisfiable excess is dropped,
    * the same spirit as waterfill's capacity clamp.
    */
  def selectByAllocationsEpochs(docs: DataFrame, idCol: String,
      keyCol: String, tokenCountCol: String, allocs: DataFrame,
      allocCol: String = "alloc", maxEpochs: Int = 1,
      hashBuckets: Int = 64, maxStrata: Int = 10000): DataFrame = {
    import graft.expressions.HashExpressions
    require(maxEpochs >= 1, s"bad maxEpochs $maxEpochs")
    require(hashBuckets >= 1, s"bad hashBuckets $hashBuckets")
    val spark = docs.sparkSession
    import spark.implicits._
    val allocRows = allocs
      .select(col(keyCol).cast("string"), col(allocCol).cast("double"))
      .limit(maxStrata + 1).collect()
    require(allocRows.length <= maxStrata,
      s"more than $maxStrata strata in the allocation table - " +
        "selectByAllocationsEpochs cumulates per-stratum facts driver-side")
    val budget: Map[String, Long] = allocRows
      .map(r => r.getString(0) -> math.floor(r.getDouble(1)).toLong).toMap
    val base = graft.CacheScope.register(
      docs.filter(col(tokenCountCol).isNotNull)
        .withColumn("__mx_b",
          pmod(HashExpressions.splitmix64(col(idCol).cast("long")),
            lit(hashBuckets.toLong)).cast("int"))
        .persist())
    val totals = base
      .groupBy(col(keyCol).cast("string").as("__k"), col("__mx_b"))
      .agg(sum(col(tokenCountCol).cast("long")).as("t"))
      .limit(maxStrata * hashBuckets + 1).collect()
    require(totals.length <= maxStrata.toLong * hashBuckets,
      s"(stratum, bucket) table exceeded ${maxStrata.toLong * hashBuckets}" +
        " rows - raise maxStrata only if the stratum table really is " +
        "bounded")
    // per stratum: complete epochs from integer division by the FULL
    // capacity, then the bucket scan runs on the remainder only
    val cuts: Seq[(String, Int, Int, Long)] = totals
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case (k, rows) =>
        val b = budget.getOrElse(k, 0L)
        val cap = rows.map(_._3).sum
        val fe =
          if (cap <= 0) 0
          else math.min(b / cap, maxEpochs.toLong).toInt
        val remBudget = if (fe >= maxEpochs) 0L else b - fe.toLong * cap
        var acc = 0L
        var cut = hashBuckets
        var rem = 0L
        var found = false
        rows.sortBy(_._2).foreach { case (_, bkt, t) =>
          if (!found) {
            if (acc + t <= remBudget) acc += t
            else { cut = bkt; rem = remBudget - acc; found = true }
          }
        }
        (k, fe, cut, rem)
      }
    val cutDf = broadcast(cuts.toDF("__k", "__fe", "__cutb", "__rem"))
    val joined = base.join(cutDf, base(keyCol).cast("string") === $"__k")
    // complete epochs: every doc of the stratum × 1..fe (bounded explode)
    val complete = joined.filter(col("__fe") >= 1)
      .withColumn("epoch",
        explode(sequence(lit(1), col("__fe"))))
    val partialEpoch = (col("__fe") + 1).cast("int")
    val full = joined.filter(col("__mx_b") < col("__cutb"))
      .withColumn("epoch", partialEpoch)
    val w = Window.partitionBy(col("__k"))
      .orderBy(HashExpressions.splitmix64(col(idCol).cast("long")),
        col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary2 = joined.filter(col("__mx_b") === col("__cutb"))
      .withColumn("__cum", sum(col(tokenCountCol).cast("long")).over(w))
      .filter(col("__cum") <= col("__rem"))
      .drop("__cum")
      .withColumn("epoch", partialEpoch)
    complete.unionByName(full).unionByName(boundary2)
      .drop("__k", "__fe", "__cutb", "__rem", "__mx_b")
  }

  /** Multilingual α-sampling under a token budget — the mC4/multilingual-
    * T5 mixing rule realized as a BUDGET allocation rather than
    * probabilistic thinning ([[Sampling.temperatureSample]] is the
    * thinning form): language `l` holding `T_l` total tokens gets weight
    * `w_l ∝ T_l^α` (α < 1 up-weights low-resource languages), a token
    * budget `B_l = ⌊B · w_l / Σw⌋`, and then the hash-ordered greedy
    * prefix of its documents until the budget is spent — a deterministic,
    * reproducible corpus cut.
    *
    * Replay discipline: `T_l^α` snaps to the 1e-6 grid and scales to an
    * exact long (libm `pow` agrees across engines within an ulp — the
    * KM ln-factor contract), so `Σw` is an exact integer sum and every
    * budget is pure integer arithmetic (`B·w_sc div Σw_sc`). Selection
    * order is `(splitmix64(id), id)` — the q59/q67 hash family, mirrored
    * bit-exactly in the oracle — and the running token sum is an exact
    * integer window, keyed by language.
    *
    * 100 TB shape: one token-count projection, one 5-row language
    * aggregate (broadcast), and ONE keyed window over (lang, hash
    * order) — the per-language sort is the unavoidable cost of a greedy
    * budget cut and shuffles once; no global sort, no driver loop.
    *
    * Output: (lang, n_docs, tokens_selected, budget, total_tokens).
    */
  def languageBudgetMix(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, budgetTokens: Long, alpha: Double): DataFrame = {
    require(budgetTokens > 0, s"bad budget $budgetTokens")
    require(alpha > 0 && alpha <= 1, s"alpha out of (0,1]: $alpha")
    val d = docs.select(col(idCol).as("__id"), col(langCol).as("lang"),
      graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("long").as("__ntok"))
    val tot = d.groupBy(col("lang"))
      .agg(sum(col("__ntok")).as("total_tokens"))
    val w = tot.withColumn("__wsc",
      floor(pow(col("total_tokens").cast("double"), lit(alpha))
        * 1e6 + 0.5).cast("long"))
    // the budget product runs in DECIMAL: at corpus scale B ~ 10^12
    // tokens and w_sc ~ 10^10 overflow a long product (~8·10^21 >
    // 2^63); decimal(38,0) holds it exactly and the integer division
    // stays exact. Result fits a long by construction (≤ B).
    val b = w.crossJoin(broadcast(w.agg(sum(col("__wsc")).as("__swsc"))))
      .withColumn("budget",
        expr(s"CAST((CAST($budgetTokens AS DECIMAL(38,0)) * __wsc) " +
          "div __swsc AS BIGINT)"))
    val wOrd = Window.partitionBy(col("lang"))
      .orderBy(col("__skey"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sel = d
      .withColumn("__skey", graft.expressions.HashExpressions
        .splitmix64(col("__id").cast("long")))
      .withColumn("__ctok", sum(col("__ntok")).over(wOrd))
      .join(broadcast(b.select(col("lang"), col("budget"))), Seq("lang"))
      .filter(col("__ctok") <= col("budget"))
    b.join(sel.groupBy(col("lang")).agg(
        count(lit(1)).as("__n"), sum(col("__ntok")).as("__tk")),
        Seq("lang"), "left")
      .select(col("lang"),
        coalesce(col("__n"), lit(0L)).as("n_docs"),
        coalesce(col("__tk"), lit(0L)).as("tokens_selected"),
        col("budget"), col("total_tokens"))
  }

  /** Hedge / multiplicative-weights mixture reweighting — the DoReMi
    * inner update (Xie et al. 2023: Group-DRO multiplicative weights
    * over domains; also the classic Hedge/Exp3 step): starting uniform,
    * each round multiplies every domain's weight by `exp(η·loss_d)`
    * (hard domains gain mass) and renormalizes. DoReMi recomputes
    * per-domain excess loss each round from proxy-model training;
    * this is the DATA-side operator — the update trajectory on a
    * fixed per-domain loss table, which is what a corpus pipeline
    * replays when it applies published mixture weights.
    *
    * Exactness: the only float entry points are `exp` (libm-ulp class,
    * the house ln/pow contract) and two exact-operand divisions — each
    * round snaps `w·exp(η·ℓ)` to the 1e-6 grid AS AN INTEGER
    * (`floor(·1e6 + ½)`), sums those integers EXACTLY, and
    * renormalizes on the grid, so the k-round trajectory replays
    * bit-identically on any engine regardless of domain summation
    * order.
    *
    * Execution: the domain table is bounded BY CONTRACT (`maxDomains`,
    * checked distributively before the collect — the Markov maxStates
    * discipline); k rounds over ≤ maxDomains rows are a driver fold,
    * not k shuffle stages. Output: (domain, weight) — final grid
    * weights summing to ≈ 1.
    */
  def hedgeMixtureWeights(losses: DataFrame, domainCol: String,
      lossCol: String, eta: Double, iters: Int,
      maxDomains: Int = 4096): DataFrame = {
    require(eta > 0 && iters >= 1, s"bad hedge params eta=$eta iters=$iters")
    val spark = losses.sparkSession
    import spark.implicits._
    val nDom = losses.select(col(domainCol)).distinct().count()
    require(nDom >= 1 && nDom <= maxDomains,
      s"$nDom domains exceed maxDomains=$maxDomains — not a bounded " +
        "mixture table; raise the bound only with a memory budget")
    val rows = losses
      .select(col(domainCol).cast("string"), col(lossCol).cast("double"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .sortBy(_._1)
    require(rows.length == nDom,
      s"${rows.length} loss rows for $nDom domains — one loss per " +
        "domain is the contract (aggregate before reweighting)")
    def snap6i(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    var w: Map[String, Double] =
      rows.map(_._1 -> graft.functions.Grid.snapD(
        1.0 / rows.length)).toMap
    for (_ <- 1 to iters) {
      val m = rows.map { case (d, l) =>
        d -> snap6i(w(d) * math.exp(eta * l))
      }
      val tot = m.map(_._2).sum // exact long sum — order-free
      w = m.map { case (d, n) =>
        d -> graft.functions.Grid.snapD(n.toDouble / tot)
      }.toMap
    }
    rows.map { case (d, _) => (d, w(d)) }.toSeq
      .toDF(domainCol, "weight")
  }
}
