package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Count–min sketch: one-sided error, exactness without collisions,
  * shard mergeability, and parameter validation.
  */
class SketchesSpec extends SparkSpec {

  private def itemsOf(rows: Seq[String]) = {
    val s = spark
    import s.implicits._
    rows.toDF("item")
  }

  test("estimates are >= truth always and exact at collision-free " +
      "width; a cramped width overcounts but never undercounts") {
    val data = Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      Seq.fill(5)("gamma") ++ (1 to 20).map(i => s"tail$i")
    val items = itemsOf(data)
    val truth = items.groupBy(col("item")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // wide: 23 distinct items in 4x4096 cells -> no collisions expected
    val wide = Sketches.countMinBuild(items, "item", depth = 4,
      width = 4096)
    val wideEst = Sketches.countMinEstimate(items, "item", wide, 4, 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wideEst === truth, "collision-free sketch must be exact")

    // cramped: 23 items in 4x4 cells -> collisions guaranteed, but the
    // estimate stays one-sided
    val tiny = Sketches.countMinBuild(items, "item", depth = 4, width = 4)
    val tinyEst = Sketches.countMinEstimate(items, "item", tiny, 4, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, c) =>
      assert(tinyEst(t) >= c, s"undercount on $t: ${tinyEst(t)} < $c")
    }
    assert(truth.exists { case (t, c) => tinyEst(t) > c },
      "4x4 cells over 23 items must collide somewhere")
  }

  test("merged shard sketches equal the whole-corpus sketch cell-for-" +
      "cell, and an unseen item estimates 0") {
    val a = itemsOf(Seq("x", "x", "y"))
    val b = itemsOf(Seq("y", "z"))
    val whole = Sketches.countMinBuild(a.unionByName(b), "item", 4, 256)
    val merged = Sketches.countMinMerge(
      Sketches.countMinBuild(a, "item", 4, 256),
      Sketches.countMinBuild(b, "item", 4, 256))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    assert(cells(whole) === cells(merged))

    val est = Sketches.countMinEstimate(itemsOf(Seq("never-seen")),
        "item", whole, 4, 256)
      .collect().map(r => r.getLong(1))
    assert(est.toSeq === Seq(0L), "unseen item must estimate 0")
  }

  test("hll: duplicates never change registers, shard merge equals the " +
      "whole-set sketch, and the estimate lands in the error band") {
    val s = spark
    import s.implicits._
    val unique = (1 to 1000).map(i => s"item$i")
    val items = itemsOf(unique)
    val withDups = itemsOf(unique ++ unique.take(500) ++ unique.take(100))
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val regs = Sketches.hllRegisters(items, "item", p = 6)
    assert(regMap(regs) === regMap(
      Sketches.hllRegisters(withDups, "item", p = 6)),
      "registers are a function of the item SET")

    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(itemsOf(unique.take(400)), "item", 6),
      Sketches.hllRegisters(itemsOf(unique.drop(400)), "item", 6))
    assert(regMap(merged) === regMap(regs), "shard merge must compose")

    val est = Sketches.hllEstimate(regs, p = 6).collect().head
      .getAs[Double]("hll_estimate")
    assert(math.abs(est - 1000) / 1000.0 < 0.35,
      s"estimate $est too far from 1000 for m=64")

    // small range: 3 distinct items -> linear counting is near-exact
    val small = Sketches.hllEstimate(
      Sketches.hllRegisters(itemsOf(Seq("a", "b", "c")), "item", 6), 6)
      .collect().head.getAs[Double]("hll_estimate")
    assert(math.abs(small - 3.0) < 0.15, s"linear counting off: $small")
  }

  test("grouped hll isolates groups: each group's registers and " +
      "estimate equal the single-set sketch of that group alone") {
    val s = spark
    import s.implicits._
    val a = (1 to 300).map(i => ("ga", s"a$i"))
    val b = (1 to 40).map(i => ("gb", s"b$i"))
    val grouped = (a ++ b).toDF("g", "item")
    val byGroup = Sketches.hllEstimateBy(
        Sketches.hllRegistersBy(grouped, "g", "item", p = 6), "g", p = 6)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    Seq("ga" -> a, "gb" -> b).foreach { case (g, rows) =>
      val solo = Sketches.hllEstimate(
          Sketches.hllRegisters(rows.map(_._2).toDF("item"), "item", 6), 6)
        .collect().head
      assert(byGroup(g) ===
        ((solo.getLong(1), solo.getLong(2), solo.getDouble(3))),
        s"group $g diverges from its solo sketch")
    }
  }

  test("null items contribute no cells/registers and estimate nothing") {
    val s = spark
    import s.implicits._
    val withNull = Seq(Option("x"), Option("y"), None).toDF("item")
    val clean = Seq("x", "y").toDF("item")
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells(Sketches.countMinBuild(withNull, "item", 4, 256)) ===
      cells(Sketches.countMinBuild(clean, "item", 4, 256)))
    def rmap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rmap(Sketches.hllRegisters(withNull, "item", 6)) ===
      rmap(Sketches.hllRegisters(clean, "item", 6)))
    // a null query row estimates nothing rather than joining on null
    val est = Sketches.countMinEstimate(withNull, "item",
      Sketches.countMinBuild(clean, "item", 4, 256), 4, 256)
    assert(est.count() === 2)
  }

  test("non-power-of-two width and absurd depth are refused") {
    val items = itemsOf(Seq("x"))
    intercept[IllegalArgumentException] {
      Sketches.countMinBuild(items, "item", depth = 4, width = 1000)
    }
    intercept[IllegalArgumentException] {
      Sketches.countMinBuild(items, "item", depth = 0, width = 1024)
    }
  }

  test("log-hist: exact power-of-two bucketing, integer ranks, shard " +
      "merge equals the whole, estimates bound the truth within 2x") {
    val s = spark
    import s.implicits._
    // buckets: 0→b0; 1→b1; 2,3→b2; 4..7→b3; 8→b4
    val vals = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("v")
    val hist = Sketches.logHistBuild(vals, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist === Map(0 -> 1L, 1 -> 1L, 2 -> 2L, 3 -> 4L, 4 -> 1L))

    // quantiles of the 9 values: rank(50) = ceil(4.5) = 5 → the 5th
    // smallest (4) lives in bucket 3 (est_hi 7); rank(100) = 9 → 8 in
    // bucket 4 (est_hi 15)
    val qs = Sketches.logHistQuantiles(
        Sketches.logHistBuild(vals, "v"), Seq(50, 100))
      .collect()
      .map(r => r.getAs[Int]("pct") ->
        ((r.getAs[Long]("rank"), r.getAs[Int]("bucket"),
          r.getAs[Long]("est_hi"))))
      .toMap
    assert(qs(50) === ((5L, 3, 7L)))
    assert(qs(100) === ((9L, 4, 15L)))

    // shard merge ≡ whole-corpus histogram, bucket for bucket
    val (a, b) = (Seq(1L, 5L, 9L).toDF("v"), Seq(2L, 6L, 700L).toDF("v"))
    val merged = Sketches.logHistMerge(
        Sketches.logHistBuild(a, "v"), Sketches.logHistBuild(b, "v"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val whole = Sketches.logHistBuild(a.unionByName(b), "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged === whole)

    // the 2x bound: est_hi ≥ true quantile and < 2·max(1, true)
    val data = (1L to 1000L).map(i => (i % 97) * (i % 89)).toDF("v")
    val exact = data.collect().map(_.getLong(0)).sorted
    Sketches.logHistQuantiles(Sketches.logHistBuild(data, "v"),
        Seq(50, 90, 99)).collect().foreach { r =>
      val t = exact(r.getAs[Long]("rank").toInt - 1)
      val e = r.getAs[Long]("est_hi")
      assert(e >= t && e < 2 * math.max(1L, t),
        s"pct ${r.getAs[Int]("pct")}: est $e vs true $t")
    }

    // negative values are a loud error, nulls contribute nothing
    val neg = intercept[Exception] {
      Sketches.logHistBuild(Seq(-1L).toDF("v"), "v").collect()
    }
    assert(neg.getMessage.contains("logBucket: negative value"),
      s"unexpected error: ${neg.getMessage}")
    // ... and so is overflow: a value >= 2^maxBits would clamp into
    // the top bucket and silently break the one-sided est_hi bound
    val over = intercept[Exception] {
      Sketches.logHistBuild(Seq(16L).toDF("v"), "v", maxBits = 4)
        .collect()
    }
    assert(over.getMessage.contains("overflows the sketch"),
      s"unexpected error: ${over.getMessage}")
    // the boundary value 2^maxBits - 1 still buckets
    assert(Sketches.logHistBuild(Seq(15L).toDF("v"), "v", maxBits = 4)
      .head().getInt(0) === 4)
    val withNull = Seq(Some(3L), None, Some(5L)).toDF("v")
    assert(Sketches.logHistBuild(withNull, "v")
      .agg(sum(col("cnt"))).head().getLong(0) === 2L)
  }

  test("grouped log-hist isolates groups and reads out per-group " +
      "quantiles in one pass") {
    val s = spark
    import s.implicits._
    val items = (Seq.tabulate(10)(i => ("small", i.toLong + 1)) ++
      Seq.tabulate(10)(i => ("big", (i.toLong + 1) * 100))).toDF("k", "v")
    val qs = Sketches.logHistQuantilesBy(
        Sketches.logHistBuildBy(items, "k", "v"), "k", Seq(50, 100))
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Int]("pct")) ->
        r.getAs[Long]("est_hi"))
      .toMap
    // small: rank(50)=5 → value 5 in bucket 3 → 7; rank(100)=10 →
    // value 10, bucket 4 → 15
    assert(qs(("small", 50)) === 7L && qs(("small", 100)) === 15L)
    // big: rank(50)=5 → 500 in bucket 9 → 511; rank(100)=10 → 1000 in
    // bucket 10 → 1023
    assert(qs(("big", 50)) === 511L && qs(("big", 100)) === 1023L)
  }

  test("hllOverlapMatrix: identical sets overlap fully, disjoint sets near zero") {
    val s = spark
    import s.implicits._
    val items = (
      (1 to 300).map(i => ("x", s"tok$i")) ++
      (1 to 300).map(i => ("y", s"tok$i")) ++        // y == x
      (1 to 300).map(i => ("z", s"other$i"))).toDF("k", "item")
    val m = Sketches.hllOverlapMatrix(items, "k", "item", p = 6)
      .collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        (r.getAs[Double]("est_a"), r.getAs[Double]("est_union"),
          r.getAs[Double]("est_overlap"))).toMap
    val (estX, unionXy, overXy) = m(("x", "y"))
    // identical sets: union estimate equals the singles, overlap ~ |x|
    assert(unionXy === estX)
    assert(math.abs(overXy - estX) < 1e-9)
    // disjoint sets: overlap estimate well below the set size
    val (_, _, overXz) = m(("x", "z"))
    assert(math.abs(overXz) < 120.0, s"got $overXz")
    // matrix is the strict upper triangle: 3 pairs
    assert(m.size === 3)
  }

  test("KMV: exact below k, estimator within a 2x band above k, " +
      "shard merge == whole-stream sketch") {
    val s = spark
    import s.implicits._
    val small = (1 to 40).map(i => ("s", s"item_$i"))
    val big = (1 to 5000).map(i => ("b", s"item_$i"))
    val df = (small ++ big).toDF("key", "item")
    val est = Sketches.kmvEstimateBy(
        Sketches.kmvSketchBy(df, "key", "item", 64), 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(est("s") === ((40L, 40.0))) // below k: the sketch IS the set
    val (kept, dv) = est("b")
    assert(kept === 64L)
    assert(dv > 2500 && dv < 10000, s"estimate $dv for true 5000")
    // mergeability: sketch two shards independently, merge == whole
    val shardA = Sketches.kmvSketchBy(
      big.take(2500).toDF("key", "item"), "key", "item", 64)
    val shardB = Sketches.kmvSketchBy(
      big.drop(2500).toDF("key", "item"), "key", "item", 64)
    val merged = Sketches.kmvMerge(shardA, shardB, 64)
      .select("key", "rank", "h").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val whole = Sketches.kmvSketchBy(
        big.toDF("key", "item"), "key", "item", 64)
      .select("key", "rank", "h").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(merged === whole)
  }
}
