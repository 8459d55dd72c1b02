package graft.sources

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** The skipping-manifest laws, proven on REAL partitioned files: pruning
  * is lossless (no matching row lives in a pruned shard), the surviving
  * shard set IS the set of partition directories a reader must touch,
  * and a range layout prunes strictly more than a key scatter.
  */
class SkippingManifestSpec extends SparkSpec {

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private val lo = java.sql.Date.valueOf("1995-01-01")
  private val hi = java.sql.Date.valueOf("1995-03-31")

  private def shardify(range: Boolean) =
    if (range) orders.withColumn("shard", expr(
      "CAST(datediff(o_orderdate, DATE '1992-01-01') DIV 160 AS INT)"))
    else orders.withColumn("shard", pmod(col("o_orderkey"), lit(16)).cast("int"))

  test("pruning is lossless: every predicate-matching row is in a " +
      "surviving shard, under both layouts") {
    Seq(true, false).foreach { isRange =>
      val df = shardify(isRange)
      val manifest = SkippingManifest.build(df, "shard", Seq("o_orderdate"))
      val surv = SkippingManifest.survivors(manifest, "o_orderdate",
        lit(lo), lit(hi)).select("shard")
      val missed = df.filter(col("o_orderdate").between(lo, hi))
        .join(surv, Seq("shard"), "left_anti")
      assert(missed.count() === 0, s"range=$isRange")
    }
  }

  test("the surviving shards equal the partition directories a reader " +
      "must touch in a real partitionBy layout") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_manifest").toString
    val df = shardify(range = true)
    df.write.mode("overwrite").partitionBy("shard").parquet(dir)
    val manifest = SkippingManifest.build(df, "shard", Seq("o_orderdate"))
    val surviving = SkippingManifest.survivors(manifest, "o_orderdate",
      lit(lo), lit(hi)).select("shard").collect()
      .map(_.getInt(0)).toSet
    // directories that actually contain matching rows
    val needed = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .filter { f =>
        spark.read.parquet(f.getAbsolutePath)
          .filter(col("o_orderdate").between(lo, hi)).count() > 0
      }
      .map(_.getName.stripPrefix("shard=").toInt).toSet
    assert(needed.subsetOf(surviving)) // lossless
    // and tight here: contiguous dates make min/max exact, no false keeps
    assert(surviving === needed)
  }

  test("merge(build(A), build(B)) == build(A union B) exactly — " +
      "incremental maintenance never rescans history") {
    val df = shardify(range = true)
    val a = df.filter(col("o_orderkey") % 2 === 0)
    val b = df.filter(col("o_orderkey") % 2 =!= 0)
    val cols = Seq("o_orderdate", "o_totalprice")
    def canon(m: org.apache.spark.sql.DataFrame) =
      m.orderBy("shard").collect().map(_.toSeq).toSeq
    val merged = SkippingManifest.merge(
      SkippingManifest.build(a, "shard", cols),
      SkippingManifest.build(b, "shard", cols), "shard", cols)
    val full = SkippingManifest.build(df, "shard", cols)
    assert(canon(merged) === canon(full))
  }

  test("a range layout prunes strictly more rows than a key scatter " +
      "for a narrow date predicate") {
    def fraction(isRange: Boolean): Double =
      SkippingManifest.scanEstimate(
        SkippingManifest.build(shardify(isRange), "shard",
          Seq("o_orderdate")), "o_orderdate", lit(lo), lit(hi))
        .head().getAs[Double]("scan_fraction")
    val r = fraction(true); val h = fraction(false)
    assert(r < 0.25, s"range layout should scan a small fraction, got $r")
    assert(h === 1.0, s"scatter layout cannot prune, got $h")
  }
}
