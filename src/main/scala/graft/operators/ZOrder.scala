package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional
  * clustering behind lakehouse `OPTIMIZE ZORDER BY`. The raw
  * interleaved KEY (on caller-bounded dims) is
  * [[graft.functions.ZOrder.interleave2]] (q234); this operator is the
  * full LAYOUT job around it: rank-scaling arbitrary-range dims
  * against a broadcast stats row, n-dim interleave, FIXED-fraction
  * bucket cuts (deterministic where `repartitionByRange`'s sampler is
  * not), the per-bucket min/max skipping profile, and the partitioned
  * writer. Rows sort by the
  * bit-interleaving of their rank-scaled dimensions, so ANY single
  * dimension's value range maps to a BOUNDED set of curve segments and
  * a min/max-pruned scan skips most files on EVERY z-dimension, not
  * just the leading sort key (a lexicographic sort prunes only its
  * first column).
  *
  * Engine-independent by construction, unlike the sampling-based
  * `repartitionByRange`: dimensions scale to `[0, 2^bits)` by integer
  * arithmetic against a broadcast 1-row min/max frame, the interleave
  * is a literal shift/mask expression tree (codegen, no UDF), and
  * buckets cut the z-space at FIXED fractions `z·nBuckets / 2^(b·d)` —
  * the whole layout replays bit-exactly in any engine, and re-running
  * the writer on the same data yields the same files (idempotent
  * maintenance jobs).
  *
  * 100 TB shape: one pass for the stats row, one shuffle on the bucket
  * id (deterministic, never a range-sampler), per-file local sort.
  * Skew caveat: min/max scaling collapses under extreme outliers (one
  * huge value squeezes the rest into few codes) — winsorize the dims
  * first (`Robust.winsorizedProfile` cuts) when the profile warns.
  */
object ZOrder {

  /** Bit-interleave pre-scaled integer columns (each in `[0, 2^bits)`):
    * bit `b` of dim `i` lands at position `b·d + i`.
    */
  private[operators] def interleaveBits(norms: Seq[Column],
      bits: Int): Column =
    (0 until bits).flatMap { b =>
      norms.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)),
          b * norms.length + i)
      }
    }.reduce(_ + _)

  /** `df` plus `__z` (the Morton code) and `__z_bucket`
    * (`__z · nBuckets / 2^(bits·d)`, fixed cuts). Null dims are
    * dropped — a null has no place on the curve; callers wanting them
    * kept should pre-impute. Dims must be integral (cast dates/
    * timestamps to day/epoch numbers first).
    */
  def zLayout(df: DataFrame, dims: Seq[String], bits: Int,
      nBuckets: Int): DataFrame = {
    require(dims.size >= 2, s"z-order needs >= 2 dims, got $dims")
    require(bits >= 1 && bits * dims.size <= 62,
      s"bits=$bits x ${dims.size} dims exceeds the long")
    require(nBuckets >= 1, s"bad nBuckets $nBuckets")
    val statCols = dims.zipWithIndex.flatMap { case (d, i) =>
      Seq(min(col(d).cast("long")).as(s"__mn_$i"),
        max(col(d).cast("long")).as(s"__mx_$i"))
    }
    val stats = df.na.drop(dims).agg(statCols.head, statCols.tail: _*)
    zLayoutWith(df, dims, bits, nBuckets, stats)
  }

  /** [[zLayout]] against CALLER-PINNED stats (the append path: a
    * delta must use the layout's ORIGINAL min/max, or its buckets
    * shear against the resident files). Out-of-range values CLAMP
    * into the edge codes — the growing-domain reality an appendable
    * layout has to absorb; a no-op for in-range data.
    */
  private[operators] def zLayoutWith(df: DataFrame, dims: Seq[String],
      bits: Int, nBuckets: Int,
      stats: DataFrame): DataFrame = {
    val scale = 1L << bits
    // (x − mn) · scale must fit in a long: a wide-range dim (epoch
    // micros at bits=31) would otherwise error the whole job under
    // ANSI or silently clamp wrapped negatives into code 0 without
    // it. Guarded per row against the broadcast stats (and against
    // the row's own offset — the append path admits out-of-range x),
    // raising loudly instead of wrapping.
    val lim = Long.MaxValue / scale
    val withNorms = df.na.drop(dims).crossJoin(broadcast(stats))
    val norms = dims.zipWithIndex.map { case (d, i) =>
      expr(s"CASE WHEN (__mx_$i - __mn_$i + 1) > ${lim}L " +
        s"OR abs(CAST($d AS BIGINT) - __mn_$i) > ${lim}L " +
        s"THEN CAST(raise_error(concat('zorder: dim $d range too " +
        s"wide for bits=$bits')) AS BIGINT) " +
        s"ELSE least(greatest(((CAST($d AS BIGINT) - __mn_$i) * " +
        s"${scale}L) DIV (__mx_$i - __mn_$i + 1), 0L), " +
        s"${scale - 1}L) END")
    }
    val span = 1L << (bits * dims.size)
    withNorms
      .withColumn("__z", interleaveBits(norms, bits))
      .withColumn("__z_bucket",
        expr(s"(__z * ${nBuckets}L) DIV ${span}L"))
      .drop(dims.indices.flatMap(i =>
        Seq(s"__mn_$i", s"__mx_$i")): _*)
  }

  /** The data-skipping audit: per bucket, row count and each dim's
    * min/max — exactly the per-file statistics a pruned scan consults.
    * Bounded output (≤ nBuckets rows); one aggregation on the bucket
    * key.
    */
  def skippingProfile(df: DataFrame, dims: Seq[String], bits: Int,
      nBuckets: Int): DataFrame = {
    val z = zLayout(df, dims, bits, nBuckets)
    val aggs = count(lit(1)).as("n_rows") +: dims.flatMap(d => Seq(
      min(col(d).cast("long")).as(s"min_$d"),
      max(col(d).cast("long")).as(s"max_$d")))
    z.groupBy(col("__z_bucket").as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  private val MetaFile = "_graft_zorder.json"

  /** Write the z-ordered layout: one directory per bucket (partition
    * pruning applies to the bucket column at rest), rows inside each
    * file sorted by the full z-value. Deterministic end to end —
    * the shuffle key is the computed bucket, never a range sample.
    * The creation stats + config ride in a sidecar so APPENDS keep
    * the same bucket function forever (the [[graft.operators.Winnow]]
    * index contract — an out-of-band modulus/stat would silently
    * shear the layout).
    */
  def writeZOrdered(df: DataFrame, dims: Seq[String], bits: Int,
      nBuckets: Int, path: String): Unit = {
    val z = zLayout(df, dims, bits, nBuckets)
    z.repartition(nBuckets, col("__z_bucket"))
      .sortWithinPartitions(col("__z_bucket"), col("__z"))
      .write.mode("overwrite").partitionBy("__z_bucket")
      .parquet(s"$path/data")
    val statCols = dims.flatMap(d => Seq(min(col(d).cast("long")),
      max(col(d).cast("long"))))
    val st = df.na.drop(dims).agg(statCols.head, statCols.tail: _*)
      .head()
    val pairs = dims.indices.map(i =>
      s"[${st.getLong(2 * i)},${st.getLong(2 * i + 1)}]")
    graft.sources.Sidecar.write(df.sparkSession, s"$path/$MetaFile",
      s"""{"bits":$bits,"nBuckets":$nBuckets,""" +
        s""""dims":[${dims.map(d => s""""$d"""").mkString(",")}],""" +
        s""""ranges":[${pairs.mkString(",")}]}""")
  }

  private def meta(spark: SparkSession,
      path: String): (Int, Int, Seq[String], Seq[(Long, Long)]) = {
    val body = graft.sources.Sidecar.read(spark, s"$path/$MetaFile")
      .getOrElse(sys.error(s"$path is not a z-order layout " +
        s"(missing $MetaFile)"))
    def intOf(k: String) = s""""$k":(\\d+)""".r
      .findFirstMatchIn(body).get.group(1).toInt
    val dims = """"dims":\[([^\]]*)\]""".r.findFirstMatchIn(body)
      .get.group(1).split(",").map(_.replaceAll("\"", "").trim).toSeq
    val ranges = """\[(-?\d+),(-?\d+)\]""".r.findAllMatchIn(body)
      .map(m => (m.group(1).toLong, m.group(2).toLong)).toSeq
    (intOf("bits"), intOf("nBuckets"), dims, ranges)
  }

  /** Fold a delta into the layout under the ORIGINAL stats (sidecar):
    * same bucket function, out-of-range values clamp to edge codes.
    */
  def appendZOrdered(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val (bits, nBuckets, dims, ranges) = meta(spark, path)
    val stats = Seq(1).toDF("__one").select(
      dims.indices.flatMap(i => Seq(
        lit(ranges(i)._1).as(s"__mn_$i"),
        lit(ranges(i)._2).as(s"__mx_$i"))): _*)
    zLayoutWith(df, dims, bits, nBuckets, stats)
      .repartition(nBuckets, col("__z_bucket"))
      .sortWithinPartitions(col("__z_bucket"), col("__z"))
      .write.mode("append").partitionBy("__z_bucket")
      .parquet(s"$path/data")
  }

  /** Per-bucket stats read FROM the layout — must equal a profile
    * computed under the creation stats whatever the append history.
    */
  def diskProfile(spark: SparkSession, path: String): DataFrame = {
    val (_, _, dims, _) = meta(spark, path)
    val data = spark.read.parquet(s"$path/data")
    val aggs = count(lit(1)).as("n_rows") +: dims.flatMap(d => Seq(
      min(col(d).cast("long")).as(s"min_$d"),
      max(col(d).cast("long")).as(s"max_$d")))
    data.groupBy(col("__z_bucket").cast("long").as("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Buckets a pruned scan on `dim ∈ [lo, hi]` must touch, per the
    * profile — the planning step a lakehouse reader runs against its
    * stats store. Returns the bucket ids (driver fact, ≤ nBuckets).
    */
  def bucketsFor(profile: DataFrame, dim: String, lo: Long,
      hi: Long): Seq[Long] =
    profile.filter(col(s"min_$dim") <= hi && col(s"max_$dim") >= lo)
      .select(col("bucket").cast("long"))
      .collect().map(_.getLong(0)).toSeq.sorted
}
