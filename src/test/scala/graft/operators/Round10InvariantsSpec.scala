package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded property-style invariants over the round-10 families —
  * contracts that must hold for ANY input, checked across deterministic
  * random corpora (the OperatorInvariantsSpec convention).
  */
class Round10InvariantsSpec extends SparkSpec {

  test("image banding == brute force at Hamming <= 3 on random corpora") {
    Seq(3L, 11L).foreach { seed =>
      val s = spark
      import s.implicits._
      val rnd = new scala.util.Random(seed)
      val rows = Seq.tabulate(60) { i =>
        (i.toLong, Seq.fill(64)(rnd.nextInt(256).toDouble))
      }
      // half the ids get a lightly perturbed twin
      val twins = rows.collect { case (id, px) if id % 2 == 0 =>
        (id + 500L, px.zipWithIndex.map { case (p, j) =>
          if (j == (id % 64).toInt) math.min(255.0, p + 4) else p })
      }
      val media = Multimodal.asMedia(Multimodal.encodePng(
        (rows ++ twins).toDF("id", "px"), "id", "px", side = 8),
        "media_id", "media")
      val hashes = MediaDedup.averageHash(media).cache()
      val got = MediaDedup.nearDupPairs(hashes, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val hs = hashes.collect().map(r => (r.getAs[Long]("media_id"),
        Seq("b0", "b1", "b2", "b3").map(r.getAs[Long](_))))
      val brute = (for {
        (ia, ba) <- hs; (ib, bb) <- hs if ia < ib
        d = ba.zip(bb).map { case (x, y) =>
          java.lang.Long.bitCount(x ^ y) }.sum
        if d <= 3
      } yield (ia, ib)).toSet
      assert(got === brute, s"seed $seed")
      hashes.unpersist()
    }
  }

  test("manifest merge over any split == whole-corpus build") {
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("shard", pmod(col("o_orderkey"), lit(8)).cast("int"))
    val cols = Seq("o_orderdate", "o_totalprice")
    Seq(3, 5, 13).foreach { mod =>
      val parts = (0 until 3).map(r => orders
        .filter(pmod(col("o_orderkey"), lit(mod)) % 3 === r))
      val merged = parts.map(p =>
        graft.sources.SkippingManifest.build(p, "shard", cols))
        .reduce((a, b) =>
          graft.sources.SkippingManifest.merge(a, b, "shard", cols))
      val whole = graft.sources.SkippingManifest.build(orders, "shard", cols)
      assert(merged.orderBy("shard").collect().map(_.toSeq).toSeq ===
        whole.orderBy("shard").collect().map(_.toSeq).toSeq, s"mod $mod")
    }
  }

  test("geometric threshold tables: monotone, bounded, symmetric " +
      "masses for any rational alpha") {
    val full = BigInt(2).pow(64)
    Seq((1L, 2L), (3L, 4L), (9L, 10L), (1L, 10L), (7L, 8L)).foreach {
      case (n, d) =>
        val cap = 30
        val t = Privacy.geometricThresholds(cap, n, d)
        // monotone and inside the grid; STRICT only at moderate alpha
        // (extreme alpha saturates its far tails to the grid edges —
        // floor(alpha^m * 2^64) = 0 — which the cap clamp absorbs)
        assert(t === t.sorted, s"$n/$d")
        assert(t.head >= 0 && t.last < full, s"$n/$d")
        if (2 * n >= d) assert(t.distinct.size === t.size, s"$n/$d")
        // P(x) = P(-x): T(x+1)-T(x) vs T(-x)-T(-x-1), floor slack 2
        (1 until cap - 1).foreach { x =>
          val mPos = t(cap + x) - t(cap + x - 1) // mass of +x... see below
          val mNeg = t(cap - x) - t(cap - x - 1) // mass of -x
          assert((mPos - mNeg).abs <= 2, s"$n/$d at $x")
        }
    }
  }

  test("holt resume law: fold(A ++ B) == resume(fold(A), B) for any " +
      "split point") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val series = Seq.tabulate(200)(t =>
      ("k", t, 50.0 + rnd.nextInt(100)))
    Seq(2, 57, 121, 199).foreach { cut =>
      val whole = Forecast.holtLinear(series.toDF("k", "t", "y"),
        "k", "t", "y", 0.3, 0.1, 5).head()
      val st = Forecast.holtLinear(series.take(cut).toDF("k", "t", "y"),
        "k", "t", "y", 0.3, 0.1, 5)
      val resumed = Forecast.holtLinearFrom(
        series.drop(cut).toDF("k", "t", "y"), "k", "t", "y", st,
        0.3, 0.1, 5).head()
      assert(resumed.getAs[Double]("level") === whole.getAs[Double]("level"),
        s"cut $cut")
      assert(resumed.getAs[Double]("trend") === whole.getAs[Double]("trend"),
        s"cut $cut")
      assert(resumed.getAs[Long]("n_obs") === whole.getAs[Long]("n_obs"))
    }
  }

  test("theil-sen x-shift invariance: slope unchanged, intercept " +
      "moves by -m*c") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(9)
    val pts = Seq.tabulate(30)(i => ("k", i, 3.0 * i + rnd.nextInt(20)))
    val base = Robust.theilSenTrend(pts.toDF("k", "x", "y"),
      "k", "x", "y").head()
    val shifted = Robust.theilSenTrend(
      pts.map { case (k, x, y) => (k, x + 1000, y) }.toDF("k", "x", "y"),
      "k", "x", "y").head()
    assert(shifted.getAs[Double]("slope") === base.getAs[Double]("slope"))
    val m = base.getAs[Double]("slope")
    assert(math.abs(shifted.getAs[Double]("intercept") -
      (base.getAs[Double]("intercept") - m * 1000)) < 2e-6)
  }

  test("changepoint y-shift invariance: same split, same delta") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val pts = Seq.tabulate(80)(t =>
      ("k", t, (if (t < 33) 5.0 else 25.0) + rnd.nextInt(4)))
    val base = Robust.changePoint(pts.toDF("k", "t", "y"),
      "k", "t", "y").head()
    val shifted = Robust.changePoint(
      pts.map { case (k, t, y) => (k, t, y + 500.0) }.toDF("k", "t", "y"),
      "k", "t", "y").head()
    assert(shifted.getAs[Long]("t_split") === base.getAs[Long]("t_split"))
    assert(math.abs(shifted.getAs[Double]("delta") -
      base.getAs[Double]("delta")) < 1e-3)
  }

  test("expectations: audit counts reconcile with the violations feed") {
    val s = spark
    import s.implicits._
    Seq(17L, 23L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val df = Seq.tabulate(300)(i =>
        (i.toLong, rnd.nextInt(100) - 20, rnd.nextInt(3))).toDF("id", "v", "c")
      val rules = Seq("pos" -> (col("v") >= 0), "small" -> (col("v") < 60),
        "czero" -> (col("c") === 0))
      val audit = Expectations.audit(df, rules)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n_violations"))
        .toMap
      val feed = Expectations.violations(df, rules)
        .select(explode(col("failed_rules")).as("r"))
        .groupBy("r").count()
        .collect().map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
      rules.map(_._1).foreach { nm =>
        assert(audit(nm) === feed.getOrElse(nm, 0L), s"seed $seed $nm")
      }
    }
  }
}
