package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class RobustSpec extends SparkSpec {

  test("modified z-score and outlier flag on a known group") {
    val s = spark
    import s.implicits._
    // values 1..9 plus a far outlier: med=5.5, MAD=2.5
    val df = (Seq.tabulate(9)(i => ("g", (i + 1).toLong)) :+ (("g", 100L)))
      .toDF("grp", "v")
    val rows = Robust.annotateOutliers(df, "grp", "v", cutoff = 3.5)
      .collect()
    val byV = rows.map(r =>
      r.getAs[Long]("v") -> (r.getAs[Double]("mod_z"),
        r.getAs[Boolean]("is_outlier"))).toMap
    assert(math.abs(byV(100L)._1 - 0.6745 * (100 - 5.5) / 2.5) < 1e-12)
    assert(byV(100L)._2)
    assert(!byV(5L)._2)
  }

  test("MAD = 0 falls back to meanAD; constant group flags nothing") {
    val s = spark
    import s.implicits._
    // 7 of 9 at the median -> MAD = 0, meanAD = (30+30)/9
    val dom = (Seq.fill(7)(("m", 10L)) ++ Seq(("m", 40L), ("m", -20L)))
      .toDF("grp", "v")
    val z = Robust.annotateOutliers(dom, "grp", "v", cutoff = 3.5)
      .filter(col("v") === 40L).head()
    val meanAd = 60.0 / 9
    assert(math.abs(z.getAs[Double]("mod_z") -
      30.0 / (1.253314 * meanAd)) < 1e-12)
    // constant group: mod_z null, outlier false
    val const = Seq(("c", 5L), ("c", 5L), ("c", 5L)).toDF("grp", "v")
    val rows = Robust.annotateOutliers(const, "grp", "v").collect()
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("mod_z"))))
    assert(rows.forall(!_.getAs[Boolean]("is_outlier")))
  }

  test("madProfile aggregates counts and rounded stats per group") {
    val s = spark
    import s.implicits._
    val df = (Seq.tabulate(9)(i => ("g", (i + 1).toLong)) :+ (("g", 100L)))
      .toDF("grp", "v")
    val p = Robust.madProfile(df, "grp", "v", cutoff = 3.5).head()
    assert(p.getAs[Long]("n_rows") === 10L)
    assert(p.getAs[Double]("med") === 5.5)
    assert(p.getAs[Double]("mad") === 2.5)
    assert(p.getAs[Long]("n_outliers") === 1L)
  }

  test("winsorizedProfile: integer-rank boundaries, tails clamped " +
      "not dropped, n preserved") {
    val s = spark
    import s.implicits._
    // n = 20: loRank = ceil(20*5/100) = 1, hiRank = ceil(20*95/100) = 19
    val df = ((1 to 19).map(i => ("g", i.toLong, i.toDouble)) :+
      (("g", 20L, 1000.0))).toDF("grp", "id", "v")
    val p = Robust.winsorizedProfile(df, "grp", "id", "v").head()
    assert(p.getAs[Long]("n") === 20L)
    assert(p.getAs[Double]("lo") === 1.0)
    assert(p.getAs[Double]("hi") === 19.0)
    assert(p.getAs[Double]("mean_raw") === 59.5)
    assert(p.getAs[Double]("mean_winsorized") === 10.45)
  }

  test("winsorizedProfileSketch: sub-k groups reproduce the exact " +
      "profile; over-k groups clamp at sample boundaries with exact " +
      "means and n") {
    val s = spark
    import s.implicits._
    // 20 rows < k=64: the sample IS the group, so the profile must be
    // IDENTICAL to the exact device's
    val df = ((1 to 19).map(i => ("g", i.toLong, i.toDouble)) :+
      (("g", 20L, 1000.0))).toDF("grp", "id", "v")
    val exact = Robust.winsorizedProfile(df, "grp", "id", "v").head()
    val sk = Robust.winsorizedProfileSketch(df, "grp", "id", "v",
      k = 64).head()
    assert(sk.toSeq === exact.toSeq)

    // 2000 rows >> k=128: boundaries come from the sample — n and the
    // raw mean stay exact, lo/hi land within the sample's rank-error
    // band of the exact cuts
    val big = (1 to 2000)
      .map(i => ("h", i.toLong, ((i.toLong * i) % 1999).toDouble))
      .toDF("grp", "id", "v")
    val ex = Robust.winsorizedProfile(big, "grp", "id", "v").head()
    val ap = Robust.winsorizedProfileSketch(big, "grp", "id", "v",
      k = 128).head()
    assert(ap.getAs[Long]("n") === 2000L)
    assert(ap.getAs[Double]("mean_raw") === ex.getAs[Double]("mean_raw"))
    val vs = big.collect().map(_.getDouble(2)).sorted
    def rankOf(x: Double) = vs.count(_ <= x).toDouble / vs.length
    assert(math.abs(rankOf(ap.getAs[Double]("lo")) - 0.05) <= 0.06,
      s"lo ${ap.getAs[Double]("lo")}")
    assert(math.abs(rankOf(ap.getAs[Double]("hi")) - 0.95) <= 0.06,
      s"hi ${ap.getAs[Double]("hi")}")
  }

  test("benfordProfile: digit extraction, sub-1 rows excluded, " +
      "fractions sum to 1") {
    val s = spark
    import s.implicits._
    val df = Seq(0.5, 1.0, 1.9, 19.0, 2.0, 95.0, 900.0)
      .toDF("v")
    val rows = Robust.benfordProfile(df, "v")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows === Map(1 -> 3L, 2 -> 1L, 9 -> 2L)) // 0.5 excluded
    val fr = Robust.benfordProfile(df, "v")
      .agg(sum(col("frac"))).head().getDouble(0)
    assert(math.abs(fr - 1.0) < 1e-5)
    // benford_p of digit 1 is log10(2)
    val b1 = Robust.benfordProfile(df, "v")
      .filter(col("digit") === 1).head().getAs[Double]("benford_p")
    assert(b1 === math.rint(math.log10(2.0) * 1e6) / 1e6)
  }

  test("changePoint locates a planted mean shift at the exact split " +
      "and reports the two segment means") {
    val s = spark
    import s.implicits._
    val rows = (0 until 100).map { t =>
      val noise = (graft.functions.DedupFunctions.splitmix64(t.toLong)
        % 5L).toDouble / 10.0
      ("a", t, (if (t < 40) 10.0 else 50.0) + noise)
    } ++ Seq(("tiny", 0, 1.0), ("tiny", 1, 2.0))
    val out = Robust.changePoint(rows.toDF("k", "t", "y"), "k", "t", "y")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("t_split"),
          r.getAs[Double]("mean_before"), r.getAs[Double]("mean_after"),
          r.getAs[Double]("delta"))).toMap
    val (n, split, mb, ma, d) = out("a")
    assert(n === 100L && split === 39L, s"split at $split")
    assert(math.abs(mb - 10.0) < 0.5 && math.abs(ma - 50.0) < 0.5)
    assert(math.abs(d - 40.0) < 1.0)
    // a 2-point key still reports (split = its first point)
    assert(out("tiny")._2 === 0L)
  }

  test("theilSenTrend: the pairwise-median slope shrugs off an " +
      "outlier that would wreck OLS; keys without a distinct-x pair drop") {
    val s = spark
    import s.implicits._
    // key a: y = 2x + 1 on x = 0..4, plus a wild outlier at x = 5.
    // 10 clean pairs have slope 2.0; the 5 outlier pairs are huge;
    // the lower median of the 15 sorted slopes (rank 8) is still 2.0.
    val a = (0 to 4).map(x => ("a", x, 2.0 * x + 1)) :+ (("a", 5, 500.0))
    // key b: vertical points only (same x) -> no estimable pair
    val b = Seq(("b", 3, 1.0), ("b", 3, 9.0))
    val out = Robust.theilSenTrend((a ++ b).toDF("k", "x", "y"),
      "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("n_pairs"),
          r.getAs[Double]("slope"), r.getAs[Double]("intercept"))).toMap
    assert(out.keySet === Set("a"))
    val (np, npr, m, c) = out("a")
    assert(np === 6L && npr === 15L)
    assert(m === 2.0)
    // residuals: clean points give 1.0, the outlier 490 — median 1.0
    assert(c === 1.0)

    // maxPoints caps the pair space deterministically
    val capped = Robust.theilSenTrend(a.toDF("k", "x", "y"),
      "k", "x", "y", maxPoints = 3)
      .head()
    assert(capped.getAs[Long]("n_points") === 3L)
    assert(capped.getAs[Long]("n_pairs") === 3L)
  }

  test("poissonBursts: a 10x spike scores z = (c - mu)/sqrt(mu) " +
      "against the trailing baseline; cold-start periods unscored") {
    val s = spark
    import s.implicits._
    val rows = ((1 to 30).flatMap(p => Seq.fill(4)(("a", p.toLong))) ++
      Seq.fill(40)(("a", 31L))).toDF("k", "p")
    val out = Robust.poissonBursts(rows, "k", "p", window = 24,
        minBaseline = 8, threshold = 4.0)
      .collect().map(r => r.getLong(1) ->
        ((r.getAs[Double]("mu"), r.getAs[Double]("z"),
          r.getAs[Boolean]("is_burst")))).toMap
    // first scored period has 8 trailing observations -> period 9
    assert(!out.contains(8L) && out.contains(9L))
    // steady state: mu = 4, z = 0, no burst
    assert(out(20L) === ((4.0, 0.0, false)))
    // the spike: mu = 4 from the trailing 24, z = 36/2 = 18
    assert(out(31L) === ((4.0, 18.0, true)))
  }

  test("mahalanobis3: the symmetric 4-point simplex has the exact " +
      "closed-form distance at every vertex; a singular covariance " +
      "yields an empty frame") {
    val s = spark
    import s.implicits._
    // points 0,(2,0,0),(0,2,0),(0,0,2): cov = (4/3)I - (1/3)J, whose
    // inverse is (3/4)(I + J); every vertex has d^2 = 2.25 exactly
    val pts = Seq((1L, 0L, 0L, 0L), (2L, 2L, 0L, 0L),
      (3L, 0L, 2L, 0L), (4L, 0L, 0L, 2L)).toDF("id", "f1", "f2", "f3")
    val d2 = Robust.mahalanobis3(pts, "id", "f1", "f2", "f3")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("d2"))
      .toMap
    assert(d2.size === 4)
    d2.values.foreach(v => assert(v === 2.25, d2))
    // constant third feature -> zero row/col in cov -> det 0 -> empty
    val degen = Seq((1L, 0L, 0L, 5L), (2L, 2L, 0L, 5L),
      (3L, 0L, 2L, 5L), (4L, 1L, 1L, 5L)).toDF("id", "f1", "f2", "f3")
    assert(Robust.mahalanobis3(degen, "id", "f1", "f2", "f3")
      .count() === 0L)
  }

  test("pageHinkley: a planted level shift alarms at/after the shift; " +
      "the flat key stays quiet") {
    val s = spark
    import s.implicits._
    // key "up": 20 points at 10 then 20 points at 30 — the cumulative
    // deviation m grows by ~ (30 - mean - delta) per post-shift step;
    // key "flat": constant 10 forever -> excursion stays ~0
    val up = (0 until 20).map(t => ("up", t.toLong, 10.0)) ++
      (20 until 40).map(t => ("up", t.toLong, 30.0))
    val flat = (0 until 40).map(t => ("flat", t.toLong, 10.0))
    val df = (up ++ flat).toDF("k", "t", "x")
    val out = Robust.pageHinkley(df, "k", "t", "x",
        delta = 0.5, lambda = 10.0)
      .collect().map(r => r.getAs[String]("k") -> r).toMap
    assert(out("flat").getAs[Boolean]("drift") === false)
    assert(out("flat").getAs[Any]("t_alarm") === null)
    assert(out("flat").getAs[Double]("ph") === 0.0)
    assert(out("up").getAs[Boolean]("drift") === true)
    val alarmT = out("up").getAs[Long]("t_alarm")
    assert(alarmT >= 20L && alarmT <= 25L, s"alarm at $alarmT")
    assert(out("up").getAs[Long]("n") === 40L)
    // final running mean of the up key: (20*10 + 20*30)/40 = 20
    assert(out("up").getAs[Double]("mean") === 20.0)
  }

  test("pageHinkley: the replay-fold memory contract is a loud gate — " +
      "a key whose series exceeds maxPoints fails with the bound in " +
      "the message; keys at the bound pass") {
    val s = spark
    import s.implicits._
    // pathological key: 12 points against maxPoints = 10; sane key: 10
    val rows = (0 until 12).map(t => ("fat", t.toLong, 1.0)) ++
      (0 until 10).map(t => ("ok", t.toLong, 1.0))
    val e = intercept[Exception] { // SparkRuntimeException is private
      Robust.pageHinkley(rows.toDF("k", "t", "x"), "k", "t", "x",
        maxPoints = 10).collect()
    }
    assert(e.getMessage.contains("maxPoints=10"), e.getMessage)
    // the bound itself is inclusive: exactly-maxPoints keys fold fine
    val ok = Robust.pageHinkley(
        rows.toDF("k", "t", "x").filter($"k" === "ok"),
        "k", "t", "x", maxPoints = 10)
      .collect()
    assert(ok.length === 1 && ok.head.getAs[Long]("n") === 10L)
  }

  test("pageHinkley: result is invariant to input row order and " +
      "partitioning (the fold orders by t inside the key)") {
    val s = spark
    import s.implicits._
    val rows = (0 until 30).map(t =>
      ("k", t.toLong, if (t < 15) 5.0 else 12.0))
    val a = Robust.pageHinkley(rows.toDF("k", "t", "x"), "k", "t", "x")
      .collect()
    val b = Robust.pageHinkley(
        scala.util.Random.shuffle(rows.toList).toDF("k", "t", "x")
          .repartition(7),
        "k", "t", "x")
      .collect()
    assert(a.map(_.toString).sorted.toSeq ===
      b.map(_.toString).sorted.toSeq)
  }
}
