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

  test("keys with fewer than 2 observations drop") {
    val s = spark
    import s.implicits._
    val rows = Seq(("one", 0, 1.0), ("two", 0, 1.0), ("two", 1, 2.0))
    val out = Forecast.holtLinear(rows.toDF("k", "t", "y"),
      "k", "t", "y", alpha = 0.3, beta = 0.1, horizon = 1)
    assert(out.select("k").collect().map(_.getString(0)).toSet ===
      Set("two"))
  }
}
