package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Holt laws: the filter is EXACT on constant and perfectly linear
  * series (level tracks the last point, trend the true slope — the
  * l+b = next-value fixed point), adapts after a level shift, and
  * under-2-point keys drop.
  */
class ForecastSpec extends SparkSpec {

  test("constant and linear series are fixed points: level = last " +
      "value, trend = true slope, forecast extrapolates exactly") {
    val s = spark
    import s.implicits._
    val rows = (0 until 50).flatMap { t =>
      Seq(("const", t, 42.0), ("linear", t, 5.0 * t + 7))
    }
    val out = Forecast.holtLinear(rows.toDF("k", "t", "y"),
        "k", "t", "y", alpha = 0.3, beta = 0.1, horizon = 10)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("level"),
          r.getAs[Double]("trend"), r.getAs[Double]("forecast_10"))).toMap
    assert(out("const") === ((50L, 42.0, 0.0, 42.0)))
    // last value y(49) = 252, slope 5 -> forecast(10) = 252 + 50
    assert(out("linear") === ((50L, 252.0, 5.0, 302.0)))
  }

  test("a level shift is absorbed: the trend settles back toward zero " +
      "and the level approaches the new regime") {
    val s = spark
    import s.implicits._
    val rows = (0 until 200).map { t =>
      ("shift", t, if (t < 50) 10.0 else 100.0)
    }
    val r = Forecast.holtLinear(rows.toDF("k", "t", "y"),
      "k", "t", "y", alpha = 0.3, beta = 0.1, horizon = 1).head()
    assert(math.abs(r.getAs[Double]("level") - 100.0) < 1.0)
    assert(math.abs(r.getAs[Double]("trend")) < 1.0)
  }

  test("holtWinters learns a weekly pattern on top of a linear trend " +
      "and forecasts it, even with a third of the days missing") {
    val s = spark
    import s.implicits._
    val seas = Array(20.0, -5.0, -10.0, 0.0, 5.0, -15.0, 5.0) // sums 0
    def y(t: Int) = 100.0 + 2.0 * t + seas(t % 7)
    val full = (0 until 420).map(t => ("full", t, y(t)))
    val gappy = (0 until 420)
      .filter(t => graft.functions.DedupFunctions
        .splitmix64(t.toLong) % 3L != 0L) // drop ~1/3 of days
      .map(t => ("gappy", t, y(t)))
    val out = Forecast.holtWinters((full ++ gappy).toDF("k", "t", "y"),
        "k", "t", "y", period = 7, alpha = 0.3, beta = 0.05,
        gamma = 0.3, horizon = 7)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("trend"), r.getAs[Double]("s_min"),
          r.getAs[Double]("s_max"), r.getAs[Double]("forecast_7"))).toMap
    // forecast target: t = 419 + 7 = 426 -> y(426) = 952 + seas(426%7=6)
    val truth = y(426)
    val (tr, smin, smax, fc) = out("full")
    assert(math.abs(tr - 2.0) < 0.2, s"trend $tr")
    assert(math.abs(fc - truth) < 2.0, s"forecast $fc vs $truth")
    // seasonal spread learned: true range is 35
    assert(smax - smin > 25.0, s"seasonal range ${smax - smin}")
    // gaps don't break slot alignment (calendar-true indexing): the
    // forecast anchors at the GAPPY key's own last observed day
    val gLast = gappy.map(_._2).max
    val gTruth = y(gLast + 7)
    val g = out("gappy")
    assert(math.abs(g._4 - gTruth) < 5.0,
      s"gappy forecast ${g._4} vs $gTruth (t_last $gLast)")
  }

  test("keys with fewer than 2 observations drop") {
    val s = spark
    import s.implicits._
    val rows = Seq(("one", 0, 1.0), ("two", 0, 1.0), ("two", 1, 2.0))
    val out = Forecast.holtLinear(rows.toDF("k", "t", "y"),
      "k", "t", "y", alpha = 0.3, beta = 0.1, horizon = 1)
    assert(out.select("k").collect().map(_.getString(0)).toSet ===
      Set("two"))
  }

  test("backtestHolt: on a linear series the forecast lands c+7, the " +
      "actual is the window mean c+4, ape = 3/(c+4)") {
    val s = spark
    import s.implicits._
    val df = (0L to 100L).map(t => ("k", t, t.toDouble))
      .toDF("k", "t", "y")
    val out = Forecast.backtestHolt(df, "k", "t", "y",
        cutoffs = Seq(50L, 80L), alpha = 0.3, beta = 0.1, horizon = 7)
      .orderBy("cutoff").collect()
    assert(out.length === 2)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getAs[Double]("forecast") === 57.0)
    assert(out(0).getAs[Double]("actual") === 54.0)
    assert(out(0).getAs[Double]("ape") === r6(3.0 / 54))
    assert(out(1).getAs[Double]("forecast") === 87.0)
    assert(out(1).getAs[Double]("ape") === r6(3.0 / 84))
    // a cutoff past the data has no actual window -> drops
    val none = Forecast.backtestHolt(df, "k", "t", "y", Seq(100L),
      0.3, 0.1, 7)
    assert(none.count() === 0L)
  }

  test("backtestHoltWinters: once the register converges, each " +
      "cutoff's week-ahead forecast tracks the seasonal truth the " +
      "linear backtest cannot see") {
    val s = spark
    import s.implicits._
    val seas = Array(20.0, -5.0, -10.0, 0.0, 5.0, -15.0, 5.0)
    def y(t: Long) = 100.0 + 2.0 * t + seas((t % 7).toInt)
    val df = (0L until 420L).map(t => ("k", t, y(t))).toDF("k", "t", "y")
    val cutoffs = Seq(280L, 350L, 400L)
    val out = Forecast.backtestHoltWinters(df, "k", "t", "y", cutoffs,
        period = 7, alpha = 0.3, beta = 0.05, gamma = 0.3, horizon = 7)
      .orderBy("cutoff").collect()
    assert(out.length === 3)
    for ((r, c) <- out.zip(cutoffs.sorted)) {
      assert(r.getAs[Long]("cutoff") === c)
      assert(r.getAs[Long]("n_obs") === c + 1)
      // actual = mean of y over (c, c+7] — one full week, so the
      // seasonal terms sum to 0 and the mean is the trend midpoint
      val expectAct = (1 to 7).map(h => y(c + h)).sum / 7.0
      assert(math.abs(r.getAs[Double]("actual") - expectAct) < 1e-6)
      // the real claim: the POINT forecast for day c+7 nails that
      // day's value — trend AND its slot's seasonal — within 2.
      // (Its APE against the window MEAN is dominated by the slot
      // seasonal the mean cancels, ~seas/mean + 3·trend/mean ≈ 4%
      // here — the point-vs-mean convention backtestHolt set for
      // gappy series, inherited unchanged.)
      assert(math.abs(r.getAs[Double]("forecast") - y(c + 7)) < 2.0,
        s"cutoff $c forecast ${r.getAs[Double]("forecast")} " +
          s"vs ${y(c + 7)}")
      assert(r.getAs[Double]("ape") < 0.08,
        s"cutoff $c ape ${r.getAs[Double]("ape")}")
    }
    // a cutoff past the data drops, same as the linear form
    assert(Forecast.backtestHoltWinters(df, "k", "t", "y", Seq(419L),
      7, 0.3, 0.05, 0.3, 7).count() === 0L)
  }
}
