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

  test("kendallTauBy closed forms: one swapped pair gives tau 1/3, " +
      "an x-tie discounts the denominator (2/sqrt(6)), degenerate " +
      "all-tied side reads null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("swap", 1.0, 1.0), ("swap", 2.0, 3.0), ("swap", 3.0, 2.0),
      ("tie", 1.0, 1.0), ("tie", 1.0, 2.0), ("tie", 2.0, 3.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0), ("flat", 3.0, 5.0))
      .toDF("k", "x", "y")
    val out = RankCorr.kendallTauBy(df, "k", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_concordant"), r.getAs[Long]("n_discordant"),
          Option(r.getAs[java.lang.Double]("tau_b")))).toMap
    assert(out("swap")._1 === 2L)
    assert(out("swap")._2 === 1L)
    assert(math.abs(out("swap")._3.get - 1.0 / 3) < 1e-4)
    assert(math.abs(out("tie")._3.get - 2.0 / math.sqrt(6)) < 1e-4)
    assert(out("flat")._3 === None)
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
