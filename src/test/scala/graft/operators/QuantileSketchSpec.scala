package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Quantile sketches: bottom-k sample registers (exactness under k,
  * rank error over k, shard-merge law) and the deterministic KLL
  * compactor (weight conservation, rank-error bound, merge ≈ whole).
  */
class QuantileSketchSpec extends SparkSpec {

  // Deterministic skewed fixture: values i*i mod 9973 over distinct ids
  private def fixture(n: Int) = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (s"id$i", if (i % 2 == 0) "a" else "b",
      (i.toLong * i) % 9973)).toDF("id", "key", "v")
  }

  private def exactQuantile(vs: Seq[Long], pct: Int): Long = {
    val sorted = vs.sorted
    sorted(((pct.toLong * sorted.size + 99) / 100).toInt - 1)
  }

  test("a group smaller than k keeps every row and reads out the " +
      "exact nearest-rank quantiles") {
    val df = fixture(60) // 30 rows per key < k=64
    val regs = QuantileSketch.sampleRegistersBy(df, "key", "id", "v", 64)
    assert(regs.groupBy("key").count().collect()
      .forall(_.getLong(1) == 30L))
    val out = QuantileSketch.sampleQuantilesBy(regs, Seq(50, 90))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3))
      .toMap
    val byKey = df.collect().map(r => r.getString(1) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    for (k <- Seq("a", "b"); p <- Seq(50, 90))
      assert(out((k, p)) === exactQuantile(byKey(k), p),
        s"key $k pct $p")
  }

  test("over-k groups: sample quantiles land within the advertised " +
      "rank error of the truth") {
    val df = fixture(4000) // 2000 per key, k=256
    val k = 256
    val regs = QuantileSketch.sampleRegistersBy(df, "key", "id", "v", k)
    assert(regs.groupBy("key").count().collect()
      .forall(_.getLong(1) == k.toLong), "sketch must cap at k rows")
    val out = QuantileSketch.sampleQuantilesBy(regs, Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3))
      .toMap
    val byKey = df.collect().map(r => r.getString(1) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    // rank error bound ~ sqrt(ln(2/0.05)/(2k)) ≈ 0.085; assert 0.10
    val tol = 0.10
    for (key <- Seq("a", "b"); p <- Seq(50, 90, 99)) {
      val vs = byKey(key)
      val est = out((key, p))
      val rank = vs.count(_ <= est).toDouble / vs.size
      assert(math.abs(rank - p / 100.0) <= tol,
        s"key $key pct $p: est $est has rank $rank")
    }
  }

  test("shard merge law: bottom-k of disjoint shards' registers " +
      "equals the whole-corpus registers, any fold order") {
    val df = fixture(900)
    val k = 64
    val Array(s1, s2, s3) = Array(
      df.filter(col("id").substr(3, 10).cast("int") % 3 === 0),
      df.filter(col("id").substr(3, 10).cast("int") % 3 === 1),
      df.filter(col("id").substr(3, 10).cast("int") % 3 === 2))
    def regs(d: org.apache.spark.sql.DataFrame) =
      QuantileSketch.sampleRegistersBy(d, "key", "id", "v", k)
    def keyed(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))
    val whole = regs(df).collect().map(keyed).toSet
    val foldedLR = QuantileSketch.sampleMerge(
      QuantileSketch.sampleMerge(regs(s1), regs(s2), k), regs(s3), k)
      .collect().map(keyed).toSet
    val foldedRL = QuantileSketch.sampleMerge(regs(s3),
      QuantileSketch.sampleMerge(regs(s2), regs(s1), k), k)
      .collect().map(keyed).toSet
    assert(foldedLR === whole)
    assert(foldedRL === whole)
  }

  test("weighted sample registers: weight-proportional retention " +
      "puts the sample median near the WEIGHTED population median, " +
      "far from the uniform one; merge law holds") {
    val s = spark
    import s.implicits._
    // 2000 low values at weight 1 vs 500 high values at weight 40:
    // weighted median lives in the high block (mass 20000 vs 2000),
    // uniform median in the low block
    val df = ((1 to 2000).map(i => (s"g", i.toLong, (100 + i % 50).toLong, 1L)) ++
      (1 to 500).map(i => (s"g", 10000L + i, (900 + i % 50).toLong, 40L)))
      .toDF("key", "id", "v", "w")
    val k = 256
    val regs = QuantileSketch.weightedSampleRegistersBy(
      df, "key", "id", "v", "w", k)
    assert(regs.count() === k.toLong)
    val med = QuantileSketch.sampleQuantilesBy(regs, Seq(50))
      .head().getLong(3)
    assert(med >= 900L,
      s"weighted median estimate $med must land in the heavy block")
    // weighted rank of the estimate within [0.35, 0.65]
    val rows = df.collect().map(r => (r.getLong(2), r.getLong(3)))
    val tot = rows.map(_._2).sum.toDouble
    val wrank = rows.filter(_._1 <= med).map(_._2).sum / tot
    assert(math.abs(wrank - 0.5) <= 0.15, s"weighted rank $wrank")

    // disjoint-shard merge = whole
    val sh1 = df.filter(col("id") % 2 === 0)
    val sh2 = df.filter(col("id") % 2 === 1)
    val folded = QuantileSketch.weightedSampleMerge(
      QuantileSketch.weightedSampleRegistersBy(sh1, "key", "id", "v",
        "w", k),
      QuantileSketch.weightedSampleRegistersBy(sh2, "key", "id", "v",
        "w", k), k)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val whole = regs.collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(folded === whole)
  }

  test("KLL: represented weight is conserved exactly and quantiles " +
      "hit the rank-error bound on a 20k-item skewed stream") {
    val agg = new QuantileSketch.KllQuantileAgg(128, Seq(50, 90, 99))
    val n = 20000
    val vs = (1 to n).map(i => ((i.toLong * i) % 9973).toDouble)
    var buf = agg.zero
    vs.foreach(v => buf = agg.reduce(buf, v))
    assert(buf.n === n.toLong)
    val weight = buf.n0.toLong + buf.upper.zipWithIndex
      .map { case (a, l) => a.length.toLong << (l + 1) }.sum
    assert(weight === n.toLong, "compaction must conserve weight")
    val levels = buf.upper.length + 1
    assert(buf.upper.forall(_.length <= 128), "levels stay bounded")
    val qs = agg.finish(buf)
    val sorted = vs.sorted
    val tol = 3.0 * levels / 128.0
    Seq(50, 90, 99).zip(qs).foreach { case (p, est) =>
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - p / 100.0) <= tol,
        s"pct $p: est $est rank $rank tol $tol")
    }
  }

  test("KLL merge of shard buffers conserves weight and stays within " +
      "the bound; kllQuantilesBy agrees with a driver-side fold") {
    val agg = new QuantileSketch.KllQuantileAgg(128, Seq(50, 90))
    val n = 12000
    val vs = (1 to n).map(i => ((i.toLong * 31 + i * i) % 7919).toDouble)
    val shards = vs.grouped(n / 4).toSeq
    val bufs = shards.map { sh =>
      var b = agg.zero; sh.foreach(v => b = agg.reduce(b, v)); b
    }
    val merged = bufs.reduce(agg.merge)
    assert(merged.n === n.toLong)
    val weight = merged.n0.toLong + merged.upper.zipWithIndex
      .map { case (a, l) => a.length.toLong << (l + 1) }.sum
    assert(weight === n.toLong, "merge must conserve weight")
    val sorted = vs.sorted
    val levels = merged.upper.length + 1
    val tol = 3.0 * levels / 128.0
    agg.finish(merged).zip(Seq(50, 90)).foreach { case (est, p) =>
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - p / 100.0) <= tol, s"pct $p rank $rank")
    }

    // The DataFrame wrapper runs the same fold distributed.
    val s = spark
    import s.implicits._
    val df = vs.zipWithIndex
      .map { case (v, i) => (s"g${i % 2}", v) }.toDF("key", "x")
    val out = QuantileSketch.kllQuantilesBy(df, "key", "x", 128,
      Seq(50, 90))
    assert(out.count() === 4L)
    val byKey = vs.zipWithIndex.groupBy(_._2 % 2).view
      .mapValues(_.map(_._1).sorted).toMap
    out.collect().foreach { r =>
      val key = r.getString(0).substring(1).toInt
      val p = r.getInt(1)
      val est = r.getDouble(2)
      val ks = byKey(key)
      val rank = ks.count(_ <= est).toDouble / ks.size
      assert(math.abs(rank - p / 100.0) <= 0.10,
        s"key $key pct $p rank $rank")
    }
  }

  test("parameter validation raises loudly") {
    val df = fixture(10)
    intercept[IllegalArgumentException] {
      QuantileSketch.sampleRegistersBy(df, "key", "id", "v", 1)
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.sampleQuantilesBy(df.select(col("key"),
        col("v").as("h"), col("v")), Seq(0))
    }
    intercept[IllegalArgumentException] {
      new QuantileSketch.KllQuantileAgg(7, Seq(50))
    }
  }
}
