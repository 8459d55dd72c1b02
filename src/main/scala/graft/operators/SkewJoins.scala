package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins — the 100 TB failure mode where a
  * handful of hot keys make one shuffle partition carry most of the data.
  *
  * Two complementary levers:
  *  1. AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin.*`,
  *     on by default in the session builders here) handles moderate skew
  *     transparently.
  *  2. [[saltedJoin]] handles extreme skew deterministically at plan time:
  *     the build side is replicated `saltFactor`× and the probe side's
  *     rows are spread across the salt range by a hash of their OWN row,
  *     so one hot key fans out over `saltFactor` partitions. The salt is
  *     derived with `pmod(hash(...))` — deterministic, no RNG, safe under
  *     task retries (unlike `rand()`-based salting).
  */
object SkewJoins {

  /** Equi-join `probe.probeKey == build.buildKey` with the build side
    * replicated over a salt dimension. Result rows are identical to the
    * plain join — only the shuffle distribution changes.
    *
    * @param probe      the large, possibly skewed side
    * @param build      the smaller side (replicated saltFactor times)
    * @param probeKey   join key column on the probe side
    * @param buildKey   join key column on the build side
    * @param saltCols   probe-side columns whose hash spreads the hot keys
    *                   (pick high-cardinality columns, e.g. the row id)
    * @param saltFactor number of splits per key
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, saltCols: Seq[Column],
      saltFactor: Int = 8): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(hash(saltCols: _*), lit(saltFactor)))
    val replicated = build
      .withColumn("__bsalt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        col(probeKey) === col(buildKey) && col("__salt") === col("__bsalt"))
      .drop("__salt", "__bsalt")
  }

  /** Bloom-pruned semi-join — the runtime-filter pattern made explicit:
    * build a bitmap from the build side's long keys (k splitmix probes
    * per key, [[graft.operators.Contamination.benchmarkBloom]]'s
    * device on integers), broadcast it, drop probe rows whose key
    * cannot be in the build set BEFORE the shuffle, then finish with
    * the exact semi-join to kill the false positives. The RESULT is
    * exactly `probe ⋉ build`; the bloom only moves work — at 100 TB
    * the shuffle writes shrink by the filter's selectivity while the
    * bitmap stays a config-bounded broadcast (numBits/8 bytes).
    *
    * The bitmap probe is a UDF (a bitmap has no Column-combinator
    * form — the documented exception); the per-row cost is k
    * cache-resident AND/SHIFTs, and it runs BEFORE the exchange, where
    * it pays for itself.
    */
  /** Build the bitmap from a long-key column: k splitmix probes per
    * key, OR-merged up a `treeAggregate` (no driver bottleneck beyond
    * the final numBits/8-byte array).
    */
  def buildLongBloom(build: DataFrame, buildKey: String, numBits: Int,
      kHashes: Int): Array[Long] = {
    require(numBits > 0 && (numBits & (numBits - 1)) == 0,
      s"numBits $numBits must be a power of two")
    val bits = numBits
    val k = kHashes
    build.select(col(buildKey).cast("long")).na.drop()
      .rdd.map(_.getLong(0))
      .treeAggregate(new Array[Long](bits / 64))(
        seqOp = (bm, key) => {
          val h = graft.functions.DedupFunctions.splitmix64(key)
          var j = 0
          while (j < k) {
            val pos = (graft.functions.DedupFunctions.splitmix64(h ^ j)
              & (bits - 1)).toInt
            bm(pos >>> 6) |= 1L << (pos & 63)
            j += 1
          }
          bm
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
  }

  /** The probe side of [[buildLongBloom]]: rows whose key might be in
    * the bitmap (false positives possible, false negatives not).
    */
  def filterByBloom(probe: DataFrame, probeKey: String,
      bitmap: Array[Long], numBits: Int, kHashes: Int): DataFrame = {
    require(bitmap.length == numBits / 64,
      s"bitmap length ${bitmap.length} != numBits/64 (${numBits / 64})")
    val bc = probe.sparkSession.sparkContext.broadcast(bitmap)
    val bits = numBits
    val k = kHashes
    val mightContain = udf { key: java.lang.Long =>
      key != null && {
        val h = graft.functions.DedupFunctions.splitmix64(key)
        var j = 0
        var all = true
        while (all && j < k) {
          val pos = (graft.functions.DedupFunctions.splitmix64(h ^ j)
            & (bits - 1)).toInt
          all = (bc.value(pos >>> 6) & (1L << (pos & 63))) != 0
          j += 1
        }
        all
      }
    }
    probe.filter(mightContain(col(probeKey).cast("long")))
  }

  def bloomPrunedSemiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String, numBits: Int = 1 << 20,
      kHashes: Int = 4): DataFrame = {
    val bitmap = buildLongBloom(build, buildKey, numBits, kHashes)
    filterByBloom(probe, probeKey, bitmap, numBits, kHashes)
      .join(build.select(col(buildKey)).distinct()
        .withColumnRenamed(buildKey, probeKey), Seq(probeKey),
        "left_semi")
  }

  /** Pre-flight equi-join diagnostics — the output cardinality and
    * hot-key profile of `left ⋈ right` WITHOUT running the join:
    * per-key count tables (one partial-agg shuffle per side — the
    * same statistics AQE gathers at runtime, available here BEFORE
    * committing to a plan), joined at |distinct keys| grain, never
    * the join's own fan-out. `pairs = c_left·c_right` per key is
    * exact; the top-k by fan-out names the keys that would dominate
    * the shuffle (→ [[saltedJoin]] candidates), and `share` says
    * whether skew is one bad key or the distribution's shape.
    */
  def joinCardinalityProfile(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String, topK: Int = 5): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("c_left"))
    val rc = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("c_right"))
    // `pairs` is a Long product — exact while both per-key counts stay
    // under ~3e9 (product < 2^63). Beyond that the session's ANSI mode
    // raises ARITHMETIC_OVERFLOW rather than wrapping; a diagnostic at
    // that scale should pre-aggregate counts to a coarser key first.
    val prod = lc.join(rc, Seq("key"))
      .withColumn("pairs", col("c_left") * col("c_right"))
    val tot = prod.agg(sum(col("pairs")).as("total_pairs"))
    // top-k via TakeOrdered (the order is total: pairs DESC, key),
    // ranks stamped on the <= topK survivors by the prefix scan — no
    // global rank window over the key profile
    val top = prod.crossJoin(broadcast(tot))
      .orderBy(col("pairs").desc, col("key")).limit(topK)
    Ranks.withOrderedPrefixScan(top,
        Seq(col("pairs").desc, col("key")), Seq.empty, idxCol = "__rk")
      .withColumn("rank", col("__rk").cast("int"))
      .select(col("rank"), col("key"), col("c_left"), col("c_right"),
        col("pairs"),
        round(col("pairs") / col("total_pairs").cast("double"), 6)
          .as("share"),
        col("total_pairs"))
  }
}
