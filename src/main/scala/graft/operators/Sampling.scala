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
    // (an int or string doc id would throw) — same move as Export.shardOf.
    // Cast semantics for exotic ids: Spark 4 runs ANSI mode, so a
    // non-numeric string id FAILS the job at runtime (loud, not a silent
    // NULL); fractional ids truncate — hash the raw id bytes yourself if
    // you have those.
    pmod(HashExpressions.splitmix64(id.cast("long")), lit(Buckets.toLong))
      .cast("int")

  /** Deterministic named-split assignment (train/validation/test and
    * friends): each row gets the split whose cumulative bucket range on
    * the [[hashBucket]] grid contains its hash — a pure function of the
    * id, so the assignment is stable across runs, executors, partitions
    * and re-shards (the property that makes eval sets trustworthy: a
    * doc can never migrate between train and test when the corpus is
    * re-partitioned or appended to). `splits` are (name, weight) in
    * 1/10000 units and must sum to 10000 — loudly, because a silent
    * remainder bucket would put unlabeled rows in nobody's split.
    */
  def assignSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)]): DataFrame =
    df.withColumn("split", splitOf(hashBucket(col(idCol)), splits))

  private def splitOf(bucket: Column, splits: Seq[(String, Int)]): Column = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splits must be non-empty with positive weights")
    require(splits.map(_._2).sum == Buckets,
      s"split weights must sum to $Buckets (1/10000 units), " +
        s"got ${splits.map(_._2).sum}")
    val uppers = splits.map(_._2).scanLeft(0)(_ + _).tail
    splits.zip(uppers).init
      .foldRight(lit(splits.last._1)) { case (((name, _), hi), rest) =>
        when(bucket < hi, lit(name)).otherwise(rest)
      }
  }

  /** LEAKAGE-SAFE split assignment: the split key is the document's
    * dup-cluster label (its own id when unclustered), so every member
    * of a near-duplicate cluster lands in the SAME split — the
    * train/test contamination a doc-keyed split silently commits (one
    * copy in train, its near-dup in test) cannot happen by
    * construction. `components` is any (id, component) labeling, e.g.
    * [[Dedup.connectedComponents]] over verified near-dup pairs. One
    * equi-join on the doc key; the hash/threshold device is exactly
    * [[assignSplit]]'s, applied to the cluster label.
    */
  def assignClusterSafeSplit(df: DataFrame, idCol: String,
      components: DataFrame, splits: Seq[(String, Int)]): DataFrame = {
    val comps = components.select(col("id").as(idCol),
      col("component").as("__cs_comp"))
    df.join(comps, Seq(idCol), "left")
      .withColumn("split_key",
        coalesce(col("__cs_comp"), col(idCol)))
      .withColumn("split", splitOf(hashBucket(col("split_key")), splits))
      .drop("__cs_comp")
  }

  /** STRATIFIED matched-control pairing on a scalar covariate — the
    * experimental-design primitive: within each stratum (exact match
    * on `strataCol` — the statistically standard block), every TREATED
    * row pairs with its nearest CONTROL by `valueCol` (absolute
    * difference; ties break toward the smaller value side — fully
    * deterministic). Controls may be reused (with-replacement
    * matching, the standard greedy-free form).
    *
    * Implementation is the as-of-join device on the covariate axis:
    * ONE (value, id)-ordered window pass PER STRATUM finds each
    * treated row's last-control-at-or-before and first-control-after;
    * the closer one wins. No join at all — and because the window is
    * keyed by the stratum, the pass parallelizes across strata (the
    * q141 as-of contract; an UNstratified global match would be the
    * single-partition window trap).
    */
  def matchedControls(df: DataFrame, idCol: String, treatedCol: String,
      valueCol: String, strataCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(col(valueCol), col(idCol))
    val ctrl = when(!col(treatedCol),
      struct(col(valueCol).as("v"), col(idCol).as("id")))
    val before = last(ctrl, ignoreNulls = true)
      .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1))
    val after = first(ctrl, ignoreNulls = true)
      .over(w.rowsBetween(1, org.apache.spark.sql.expressions.Window
        .unboundedFollowing))
    val withNbrs = df
      .withColumn("__mc_b", before)
      .withColumn("__mc_a", after)
      .filter(col(treatedCol))
    val dB = abs(col(valueCol) - col("__mc_b.v"))
    val dA = abs(col("__mc_a.v") - col(valueCol))
    withNbrs
      .withColumn("match",
        when(col("__mc_b").isNull, col("__mc_a"))
          .when(col("__mc_a").isNull, col("__mc_b"))
          .when(dB < dA, col("__mc_b"))
          .when(dA < dB, col("__mc_a"))
          .otherwise(col("__mc_b"))) // tie -> the smaller value side
      .filter(col("match").isNotNull)
      .select(col(strataCol), col(idCol).as("treated_id"),
        col(valueCol).as("treated_value"),
        col("match.id").as("control_id"),
        col("match.v").as("control_value"),
        abs(col(valueCol) - col("match.v")).as("match_distance"))
  }

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

  /** Temperature-flattened per-stratum keep rates — the standard
    * multi-source mixing recipe (XLM-R / mT5 style): the target share of
    * stratum `s` is `count_s^T / Σ count^T`, so `T = 1` preserves the
    * natural mix and `T → 0` flattens toward uniform. Realized as one
    * deterministic keep-rate per stratum, scaled so the most-upweighted
    * stratum keeps everything (rates are RELATIVE — compose with
    * [[sample]] for an absolute volume target):
    * `rate_s = (c_ref / c_s)^(1-T)` with `c_ref` the smallest stratum
    * for `T < 1` (the largest for `T > 1`).
    *
    * `counts` comes from one tiny aggregation (strata are few — sources,
    * languages); at 100 TB that is the one DRIVER-SIDE fact this
    * operator needs, and the per-row decision stays a pure codegen'd
    * hash filter. `T = 0.5` (the common choice) uses `sqrt`, which IEEE
    * defines as correctly rounded — rates replay bit-exactly in any
    * engine; other temperatures go through `pow`, whose last-ulp
    * behavior is libm-specific (fine in practice, stated for oracle
    * authors).
    */
  def temperatureRates(counts: Map[String, Long],
      temperature: Double): Map[String, Double] = {
    require(counts.nonEmpty && counts.values.forall(_ > 0),
      "temperatureRates needs positive stratum counts")
    require(temperature > 0, s"bad temperature $temperature")
    val cRef = if (temperature < 1.0) counts.values.min else counts.values.max
    counts.map { case (k, c) =>
      val ratio = cRef.toDouble / c.toDouble
      val e = 1.0 - temperature
      // sqrt over pow when exponents allow: sqrt is correctly rounded
      val r =
        if (e == 0.5) math.sqrt(ratio)
        else if (e == 0.0) 1.0
        else math.pow(ratio, e)
      k -> r
    }
  }

  /** Keep each stratum at its [[temperatureRates]] rate, deterministically
    * in the id (double-precision thresholds — no integer-grid rounding, so
    * an oracle replaying `bucket < rate * 10000` matches bit-exactly).
    */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      counts: Map[String, Long], temperature: Double): DataFrame = {
    val rates = temperatureRates(counts, temperature)
    val threshold = rates.foldLeft(lit(0.0)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r * Buckets)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < threshold)
  }

  /** Exactly-`n`-per-stratum sampling (eval/calibration set construction:
    * "1000 docs per source, reproducibly"): rank rows within each stratum
    * by `(splitmix64(id), id)` and keep the first `n` — a pure function
    * of the ids, so membership is stable across runs, partitionings, and
    * engines, and REMAINS a subset when `n` grows (rank order never
    * changes). One shuffle on the stratum key + a window; for strata of
    * millions of rows prefer [[sample]] with a rate — a global per-
    * stratum rank concentrates each stratum in one task by design.
    */
  def fixedPerStratum(df: DataFrame, idCol: String, stratumCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(HashExpressions.splitmix64(col(idCol).cast("long")),
        col(idCol))
    df.withColumn("__fs_rk", row_number().over(w))
      .filter(col("__fs_rk") <= n)
      .drop("__fs_rk")
  }

  /** Deterministic per-epoch global training order: the sort key is
    * `splitmix64(splitmix64(id) XOR epoch)` — a pure function of
    * (id, epoch), so every epoch is a DIFFERENT but REPRODUCIBLE
    * permutation (re-runs, retries, and other engines agree), with no
    * RNG state to checkpoint. Returns the key column; callers
    * `orderBy(epochKey, id)` for a full epoch (range-partitioned sort —
    * exactly what writing a training order requires) or `TakeOrdered`
    * for a bounded prefix.
    */
  def epochKey(id: Column, epoch: Int): Column =
    HashExpressions.splitmix64(
      HashExpressions.splitmix64(id.cast("long"))
        .bitwiseXOR(lit(epoch.toLong)))

  /** WEIGHTED sampling without replacement (Efraimidis–Spirakis A-ES,
    * IPL 2006): each row draws `key = −ln(u)/w` — an exponential with
    * rate `w` — and the `k` SMALLEST keys are exactly a weighted sample
    * without replacement. Deterministic in the id: `u` is the splitmix64
    * hash mapped to (0,1) by the standard 53-bit conversion
    * `((h >>> 11) + 0.5) · 2⁻⁵³` — every step exact double arithmetic
    * (shift, representable add, power-of-two scale), so engines agree on
    * `u` BIT-FOR-BIT and on the key to ln's rounding. Rows with NULL or
    * non-positive weight are excluded (the method is defined over
    * w > 0). Returns `df`'s surviving rows plus `sample_key`.
    *
    * 100 TB shape: map-only key computation + `TakeOrdered` (per-
    * partition top-k, merged on the driver — never a global sort
    * materialization). For k beyond driver memory, chain
    * [[temperatureSample]]-style rate pre-thinning first.
    */
  def weightedSampleWithoutReplacement(df: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 0, s"bad k $k")
    val h = HashExpressions.splitmix64(col(idCol).cast("long"))
    val u = (shiftrightunsigned(h, 11).cast("double") + lit(0.5)) *
      lit(math.pow(2, -53))
    df.filter(col(weightCol).isNotNull &&
        col(weightCol).cast("double") > 0)
      .withColumn("sample_key", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("sample_key"), col(idCol))
      .limit(k)
  }
}
