package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Decomposition laws: on a clean linear+seasonal series the interior
  * trend window is exact (the full-period window averages the
  * sum-zero seasonal away), so slot indexes recover the truth to
  * edge-effect tolerance; cross-correlation finds a planted lead at
  * exactly its lag with corr 1.
  */
class SeasonalSpec extends SparkSpec {

  private val seas = Array(12.0, -3.0, -6.0, 0.0, 3.0, -9.0, 3.0) // Σ=0

  test("decompose recovers a planted weekly pattern over a linear " +
      "trend (interior-exact, small edge bias)") {
    val s = spark
    import s.implicits._
    def y(t: Int) = 100.0 + 2.0 * t + seas(t % 7)
    val df = (0 until 140).map(t => ("k", t, y(t))).toDF("k", "t", "y")
    val out = Seasonal.decompose(df, "k", "t", "y", period = 7,
        scale = 2)
      .collect().map(r => r.getAs[Long]("slot").toInt ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("seasonal"))).toMap
    assert(out.size === 7)
    for (c <- 0 until 7) {
      assert(out(c)._1 === 20L)
      assert(math.abs(out(c)._2 - seas(c)) < 0.5,
        s"slot $c: ${out(c)._2} vs ${seas(c)}")
    }
  }

  test("decompose: gappy days shrink their trend windows instead of " +
      "shifting phase (calendar-true RANGE frame)") {
    val s = spark
    import s.implicits._
    def y(t: Int) = 50.0 + seas(t % 7)
    val df = (0 until 140).filter(_ % 5 != 3)
      .map(t => ("k", t, y(t))).toDF("k", "t", "y")
    val out = Seasonal.decompose(df, "k", "t", "y", period = 7,
        scale = 2)
      .collect().map(r => r.getAs[Long]("slot").toInt ->
        r.getAs[Double]("seasonal")).toMap
    // slots keep their identity despite 20% missing days
    assert(out(0) > out(2) && out(4) > out(5),
      s"slot order lost: $out")
  }

  test("mannKendall: monotone series saturate S = n(n-1)/2 and flag " +
      "increasing; a constant series degenerates (null z, no_trend); " +
      "an alternating series reads no_trend") {
    val s = spark
    import s.implicits._
    val rows = (0 until 40).flatMap { t =>
      Seq(("up", t, t * 2.0), ("flat", t, 7.0),
        ("zig", t, if (t % 2 == 0) 1.0 else 2.0))
    }
    val out = Robust.mannKendall(rows.toDF("k", "t", "y"), "k", "t",
        "y")
      .collect().map(r => r.getString(0) -> (r.getAs[Long]("s_stat"),
        Option(r.getAs[java.lang.Double]("z")),
        r.getAs[String]("trend"))).toMap
    assert(out("up")._1 === 40L * 39 / 2)
    assert(out("up")._3 === "increasing")
    assert(out("up")._2.exists(_ > 1.96))
    assert(out("flat") === ((0L, None, "no_trend")))
    assert(out("zig")._3 === "no_trend")
    // the deterministic cap truncates, never errors
    assert(Robust.mannKendall(rows.toDF("k", "t", "y"), "k", "t", "y",
      maxPoints = 10).head().getAs[Long]("n_obs") === 10L)
  }

  test("crossCorrelation: a planted 2-day lead reads ccf = 1 at lag " +
      "2 and below 1 elsewhere") {
    val s = spark
    import s.implicits._
    def x(t: Int) = 40.0 + seas(t % 7) + 3.0 * (t % 5)
    val rows = (2 until 120).map(t => (t, x(t), x(t - 2)))
    val df = rows.toDF("t", "x", "y")
    val out = Seasonal.crossCorrelation(df, "t", "x", "y", maxLag = 4,
        scale = 2)
      .collect().map(r => r.getAs[Int]("lag") ->
        r.getAs[Double]("ccf")).toMap
    assert(out(2) === 1.0, s"lag-2 ccf ${out(2)}")
    for (k <- Seq(0, 1, 3, 4))
      assert(out(k) < 0.999, s"lag $k ccf ${out(k)}")
  }

  test("residuals reconcile with decompose's register, and the S-H-ESD " +
      "composition flags a planted spike but NOT a naturally-big slot") {
    val s = spark
    import s.implicits._
    // linear+seasonal+bounded deterministic noise with ONE planted
    // anomaly at t = 73 (+80). The noise matters: on a NOISELESS
    // series the residual MAD collapses to edge-effect dust and the
    // modified z flags everything — ESD presumes a noise floor.
    // high-frequency (41-step mod-101 walk): a locally-smooth noise
    // would be absorbed by the +-3 trend window and MAD would
    // collapse again
    def noise(t: Int) = ((t * 7919) % 101 - 50) * 0.06
    def y(t: Int) = 100.0 + 2.0 * t + seas(t % 7) + noise(t) +
      (if (t == 73) 80.0 else 0.0)
    val df = (0 until 140).map(t => ("k", t, y(t))).toDF("k", "t", "y")
    val res = Seasonal.residuals(df, "k", "t", "y", period = 7,
      scale = 2)
    // register reconciliation: group the per-point seasonal back to
    // slot grain == decompose's output (same expressions by design)
    val fromRes = res
      .groupBy(pmod(col("t").cast("long"), lit(7L)).as("slot"))
      .agg(max(col("seasonal")).as("s"), min(col("seasonal")).as("s2"))
      .collect().map(r => r.getAs[Long]("slot") ->
        (r.getAs[Double]("s"), r.getAs[Double]("s2"))).toMap
    val fromDec = Seasonal.decompose(df, "k", "t", "y", period = 7,
        scale = 2)
      .collect().map(r => r.getAs[Long]("slot") ->
        r.getAs[Double]("seasonal")).toMap
    fromDec.foreach { case (slot, v) =>
      assert(fromRes(slot) === ((v, v)), s"slot $slot")
    }
    val flagged = Robust.annotateOutliers(res, "k", "resid",
        cutoff = 3.5)
      .filter(col("is_outlier"))
      .collect().map(_.getAs[Int]("t")).toSet
    assert(flagged.contains(73), s"planted spike missed: $flagged")
    // the big-but-seasonal slot (t % 7 == 0, the +12 slot) never
    // flags OUTSIDE the spike's trend window (t ± 3, where the spike
    // contaminates its neighbors' trend — inherent to the MA device)
    assert(!flagged.exists(t => t % 7 == 0 && math.abs(t - 73) > 3),
      s"seasonal peaks wrongly flagged: $flagged")
  }

  test("autocorrelation: hand-computed correlogram on y = 1,2,3") {
    // mean 2; c0 num = 2, lag1 num = 0, lag2 num = (1−2)(3−2) = −1
    // → acf = 1, 0, −0.5; Q1 = 15·0 = 0, Q2 = 15·(0 + 0.25/1) = 3.75
    val sqlImplicits2 = spark.implicits
    import sqlImplicits2._
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("t", "y")
    val r = Seasonal.autocorrelation(df, "t", "y", maxLag = 2,
        scale = 0)
      .orderBy(col("lag")).collect()
    assert(r.map(_.getAs[Long]("lag")).toSeq === Seq(0L, 1L, 2L))
    assert(r.map(_.getAs[Long]("n_pairs")).toSeq === Seq(3L, 2L, 1L))
    assert(r(0).getAs[Double]("acf") === 1.0)
    assert(r(1).getAs[Double]("acf") === 0.0)
    assert(r(2).getAs[Double]("acf") === -0.5)
    assert(r(0).isNullAt(r(0).fieldIndex("q_lb")))
    assert(r(1).getAs[Double]("q_lb") === 0.0)
    assert(r(2).getAs[Double]("q_lb") === 3.75)
  }

  test("partialAutocorrelation: Durbin-Levinson hand check on " +
      "y = 1,2,3 and null propagation on a constant series") {
    val sqlImplicits2 = spark.implicits
    import sqlImplicits2._
    // r1 = 0, r2 = −0.5 → pacf(1) = 0; pacf(2) = (r2 − φ11·r1) /
    // (1 − φ11·r1) = −0.5
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("t", "y")
    val r = Seasonal.partialAutocorrelation(df, "t", "y", maxLag = 2,
        scale = 0)
      .orderBy(col("lag")).collect()
    assert(r.map(_.getAs[Long]("lag")).toSeq === Seq(1L, 2L))
    assert(r(0).getAs[Double]("acf") === 0.0)
    assert(r(0).getAs[Double]("pacf") === 0.0)
    assert(r(1).getAs[Double]("pacf") === -0.5)
    val const = (1 to 8).map(t => (t.toLong, 3.0)).toDF("t", "y")
    val rc = Seasonal.partialAutocorrelation(const, "t", "y",
      maxLag = 3, scale = 0).collect()
    assert(rc.forall(row => row.isNullAt(row.fieldIndex("pacf"))))
  }

  test("partialAutocorrelation: an AR(1)-style geometric ACF cuts " +
      "off after lag 1 (the identification law)") {
    val sqlImplicits2 = spark.implicits
    import sqlImplicits2._
    // a long AR(1)-ish series: y_t = 0.8·y_{t−1} + deterministic
    // pseudo-noise — pacf(1) large, pacf(2..) near zero
    var y = 0.0
    val rows = (1 to 400).map { t =>
      val noise = (math.floorMod(
        graft.functions.DedupFunctions.splitmix64(t.toLong), 1000L))
        .toDouble / 500.0 - 1.0
      y = 0.8 * y + noise
      (t.toLong, y)
    }
    val r = Seasonal.partialAutocorrelation(rows.toDF("t", "y"), "t",
        "y", maxLag = 4, scale = 4)
      .orderBy(col("lag")).collect()
      .map(row => row.getAs[Long]("lag") -> row.getAs[Double]("pacf"))
      .toMap
    assert(r(1L) > 0.5, s"pacf $r")
    assert((2L to 4L).forall(k => math.abs(r(k)) < 0.25),
      s"pacf tail should cut off: $r")
  }

  test("runsTest: hand-computed runs, exact moments, ties at the " +
      "median drop") {
    val sqlImplicits2 = spark.implicits
    import sqlImplicits2._
    // 1,5,2,6,3,7: median 4 → signs 0,1,0,1,0,1 → 6 runs of n1=n0=3
    // μ = 4, σ² = 1.2, z = 2/√1.2 = 1.8257
    val df = Seq((1L, 1.0), (2L, 5.0), (3L, 2.0), (4L, 6.0),
      (5L, 3.0), (6L, 7.0)).toDF("t", "y")
    val r = Seasonal.runsTest(df, "t", "y", scale = 0).collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("n_above") === 3L)
    assert(r.getAs[Long]("n_below") === 3L)
    assert(r.getAs[Long]("runs") === 6L)
    assert(r.getAs[Double]("z") === 1.8257)
    // clumped signs: 1,1,2,2 → median 1.5, signs 0,0,1,1 → 2 runs
    val clumped = Seq((1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, 2.0))
      .toDF("t", "y")
    val rc = Seasonal.runsTest(clumped, "t", "y", scale = 0)
      .collect()(0)
    assert(rc.getAs[Long]("runs") === 2L)
    assert(rc.getAs[Double]("z") < 0.0)
    // odd count: the median VALUE itself drops (5 values → 4 kept)
    val odd = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0),
      (5L, 5.0)).toDF("t", "y")
    val ro = Seasonal.runsTest(odd, "t", "y", scale = 0).collect()(0)
    assert(ro.getAs[Long]("n") === 4L)
    assert(ro.getAs[Long]("n_above") === 2L)
  }

  test("periodogram: a planted cosine at k = 8 dominates the " +
      "spectrum; a constant series is flat zero (mean removed)") {
    val sqlImplicits2 = spark.implicits
    import sqlImplicits2._
    val n = 64
    val ct = Seasonal.cosTable(n)
    val planted = (0 until n).map { t =>
      (t.toLong, 100.0 + 50.0 * ct((8 * t) % n))
    }.toDF("t", "y")
    val pw = Seasonal.periodogram(planted, "t", "y", nWindow = n,
        maxFreq = 12, scale = 2)
      .collect().map(r => r.getAs[Long]("k") ->
        r.getAs[Double]("power")).toMap
    assert(pw(8L) > 50000.0, s"peak missing: $pw")
    assert(pw.filter(_._1 != 8L).values.forall(_ < pw(8L) / 100.0),
      s"spectrum not concentrated: $pw")
    val const = (0 until n).map(t => (t.toLong, 42.0)).toDF("t", "y")
    val pc = Seasonal.periodogram(const, "t", "y", nWindow = n,
      maxFreq = 4, scale = 2).collect().map(_.getAs[Double]("power"))
    assert(pc.forall(_ === 0.0), s"constant series not flat: ${pc.toSeq}")
  }

  test("periodogram: period column is n/k and a short series " +
      "zero-pads (no crash, finite powers)") {
    val sqlImplicits2 = spark.implicits
    import sqlImplicits2._
    val df = (0 until 20).map(t => (t.toLong, t.toDouble)).toDF("t", "y")
    val r = Seasonal.periodogram(df, "t", "y", nWindow = 64,
      maxFreq = 4, scale = 0).orderBy(col("k")).collect()
    assert(r.map(_.getAs[Double]("period")).toSeq ===
      Seq(64.0, 32.0, 21.3333, 16.0))
    assert(r.forall(row => !row.getAs[Double]("power").isNaN))
  }

  test("strength: a planted weekly pattern over a trend reads high " +
      "seasonal strength; an exact linear series reads pure trend") {
    val sqlImplicits2 = spark.implicits
    import sqlImplicits2._
    val weekly = Array(0.0, 10.0, -5.0, 3.0, -8.0, 12.0, -12.0)
    val rows = (0 until 140).flatMap { t =>
      Seq(("s", t.toLong, 100.0 + 0.5 * t + weekly(t % 7)),
        ("lin", t.toLong, 50.0 + 2.0 * t))
    }.toDF("k", "t", "y")
    val out = Seasonal.strength(rows, "k", "t", "y", period = 7,
        scale = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Double]("strength_seasonal"),
          r.getAs[Double]("strength_trend")))).toMap
    assert(out("s")._1 > 0.8, s"seasonal strength: $out")
    assert(out("s")._2 > 0.8, s"trend strength: $out")
    // the exact linear series: decompose's trend absorbs everything,
    // residuals ~0 → seasonal strength collapses to ~0 (degenerate
    // var_detrended), trend strength saturates
    assert(out("lin")._1 < 0.3, s"linear series seasonal: $out")
    assert(out("lin")._2 > 0.95, s"linear series trend: $out")
  }

  test("autocorrelation: a constant series nulls every r (zero " +
      "variance), an alternating one is negatively lag-1 correlated") {
    val sqlImplicits2 = spark.implicits
    import sqlImplicits2._
    val const = (1 to 10).map(t => (t.toLong, 5.0)).toDF("t", "y")
    val rc = Seasonal.autocorrelation(const, "t", "y", maxLag = 2,
      scale = 0).collect()
    assert(rc.forall(r => r.isNullAt(r.fieldIndex("acf"))))
    val alt = (1 to 20).map(t => (t.toLong, if (t % 2 == 0) 1.0
      else -1.0)).toDF("t", "y")
    val ra = Seasonal.autocorrelation(alt, "t", "y", maxLag = 2,
        scale = 0)
      .orderBy(col("lag")).collect()
    assert(ra(1).getAs[Double]("acf") < -0.9)
    assert(ra(2).getAs[Double]("acf") > 0.8)
  }
}
