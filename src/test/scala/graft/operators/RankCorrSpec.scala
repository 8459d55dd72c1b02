package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Spearman laws: any strictly monotone map scores exactly ±1 (where
  * Pearson doesn't), midranks handle ties (hand case), zero-variance
  * sides read null instead of an ANSI blowup.
  */
class RankCorrSpec extends SparkSpec {

  test("strictly monotone nonlinear relation: rho = 1 exactly, " +
      "anti-monotone -1, while Pearson on the same data is < 1") {
    val s = spark
    import s.implicits._
    val rows = (1 to 30).flatMap { i =>
      val x = i.toDouble
      Seq(("up", x, x * x * x), ("down", x, -math.exp(x / 10)))
    }
    val df = rows.toDF("k", "x", "y")
    val m = RankCorr.spearmanBy(df, "k", "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rho"))
      .toMap
    assert(m("up") === 1.0)
    assert(m("down") === -1.0)
    val pearson = df.filter(col("k") === "up")
      .agg(corr(col("x"), col("y"))).head().getDouble(0)
    assert(pearson < 0.95, s"cubic Pearson $pearson")
  }

  test("ties midrank by hand: x=[1,2,2,3] vs y with the same tie " +
      "pattern -> rho = 1; zero-variance side -> null") {
    val s = spark
    import s.implicits._
    val tied = Seq(("t", 1.0, 10.0), ("t", 2.0, 20.0),
      ("t", 2.0, 20.0), ("t", 3.0, 40.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0), ("flat", 3.0, 5.0))
      .toDF("k", "x", "y")
    val out = RankCorr.spearmanBy(tied, "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[java.lang.Double]("rho"))).toMap
    assert(out("t") === Some(1.0))
    assert(out("flat") === None)
  }
}
