package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton interleave itself, square-not-stripe
  * bucket geometry, both-dims pruning on the corpus, and the
  * deterministic partitioned writer.
  */
class ZOrderSpec extends SparkSpec {

  test("interleaveBits: hand-checked Morton codes") {
    val s = spark
    import s.implicits._
    // z(x=1, y=2) at 2 bits: x bits at positions 0,2; y at 1,3:
    // x=01 -> bits 0; y=10 -> bit 3 => z = 1 + 8 = 9
    val out = Seq((1L, 2L), (3L, 3L), (0L, 0L)).toDF("x", "y")
      .select(ZOrder.interleaveBits(Seq(col("x"), col("y")), 2).as("z"))
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(9L, 15L, 0L))
  }

  test("bucket geometry on a full grid: z buckets are squares, a " +
      "lexicographic sort's are stripes") {
    val s = spark
    import s.implicits._
    // full 16x16 grid, 16 buckets of 16 cells each
    val grid = (for (x <- 0 until 16; y <- 0 until 16)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val prof = ZOrder.skippingProfile(grid, Seq("x", "y"), bits = 4,
        nBuckets = 16)
      .collect().map(r => (r.getAs[Long]("n_rows"),
        r.getAs[Long]("max_x") - r.getAs[Long]("min_x"),
        r.getAs[Long]("max_y") - r.getAs[Long]("min_y")))
    assert(prof.length === 16)
    // every bucket: exactly 16 rows in a 4x4 bounding box — range
    // predicates on EITHER dim prune to <= 4 of 16 buckets. A sort by
    // (x, y) gives 1x16 stripes: perfect on x, useless on y.
    assert(prof.forall(_._1 === 16L))
    assert(prof.forall(p => p._2 === 3L && p._3 === 3L))
  }

  test("corpus skipping: both dims prune; writer emits one directory " +
      "per bucket with z-sorted rows") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("day", datediff(col("o_orderdate").cast("date"),
        lit(java.sql.Date.valueOf("1992-01-01"))))
    val dims = Seq("o_custkey", "day")
    val prof = graft.CacheScope.register(
      ZOrder.skippingProfile(orders, dims, bits = 8, nBuckets = 16)
        .persist())
    val nb = prof.count()
    assert(nb >= 8, s"expected most of 16 buckets populated, got $nb")
    // a 10%-wide slice on each dim must prune away buckets
    val dayHit = ZOrder.bucketsFor(prof, "day", 1200, 1440)
    val ckHit = ZOrder.bucketsFor(prof, "o_custkey",
      lo = 100, hi = 250)
    assert(dayHit.nonEmpty && dayHit.size < nb,
      s"day slice should prune: $dayHit of $nb")
    assert(ckHit.nonEmpty && ckHit.size < nb,
      s"custkey slice should prune: $ckHit of $nb")
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_zorder_spec").getAbsolutePath
    ZOrder.writeZOrdered(orders, dims, bits = 8, nBuckets = 16, path)
    val dirs = new java.io.File(s"$path/data").listFiles()
      .filter(_.getName.startsWith("__z_bucket=")).map(_.getName).sorted
    assert(dirs.length === nb)
    // a bucket-pruned read touches only the listed directories and
    // returns exactly the rows whose bucket matched
    val back = spark.read.parquet(s"$path/data")
      .filter(col("__z_bucket").isin(dayHit: _*))
    val full = spark.read.parquet(s"$path/data")
      .filter(col("day").between(1200, 1440))
    assert(full.count() > 0)
    assert(back.filter(col("day").between(1200, 1440)).count() ===
      full.count(), "pruned read must not lose matching rows")
  }

  test("appendZOrdered: the delta buckets under the CREATION stats, " +
      "out-of-range values clamp to edge buckets, disk profile == " +
      "one-shot layout under pinned stats") {
    val s = spark
    import s.implicits._
    val base = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_zorder_append_spec").getAbsolutePath
    ZOrder.writeZOrdered(base, Seq("x", "y"), bits = 6, nBuckets = 16,
      path)
    // the delta extends the domain: values beyond the creation max
    val delta = (for (x <- 60 until 80; y <- 0 until 8)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    ZOrder.appendZOrdered(delta, path)
    val prof = ZOrder.diskProfile(s, path)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_rows"))
      .toMap
    assert(prof.values.sum === 64L * 64 + 20 * 8)
    // reference: the same union laid out in ONE shot under the
    // creation stats (clamp included)
    val statDf = Seq(1).toDF("__one").select(lit(0L).as("__mn_0"),
      lit(63L).as("__mx_0"), lit(0L).as("__mn_1"),
      lit(63L).as("__mx_1"))
    val ref = ZOrder.zLayoutWith(base.union(delta), Seq("x", "y"), 6,
        16, statDf)
      .groupBy(col("__z_bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prof === ref, "append must not shear the bucket function")
    // a fresh path refuses to append
    val err = intercept[RuntimeException] {
      ZOrder.appendZOrdered(delta, path + "_nope")
    }
    assert(err.getMessage.contains("z-order layout"))
  }

  test("a dim too wide for the bit budget raises loudly instead of " +
      "wrapping the long multiply into garbage codes") {
    val s = spark
    import s.implicits._
    // epoch-micros-scale range at bits=31: (mx-mn+1)*2^31 overflows
    val df = Seq((0L, 0L), (3_000_000_000_000_000_000L, 1L))
      .toDF("t", "y")
    val e = intercept[Exception] {
      ZOrder.zLayout(df, Seq("t", "y"), bits = 31, nBuckets = 8)
        .collect()
    }
    assert(e.getMessage.contains("zorder") ||
      Option(e.getCause).exists(_.getMessage.contains("zorder")),
      s"got: ${e.getMessage}")
  }
}
