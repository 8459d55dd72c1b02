package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** WOE/IV feature screening on a hand-computed fixture. */
class WoeSpec extends SparkSpec {

  test("woeTable: hand-checked woe and iv, smoothing, null bin, " +
      "uninformative feature scores zero") {
    val s = spark
    import s.implicits._
    // color separates (red: 3/1, blue: 1/3); shape is constant
    val rows = Seq(
      ("red", "sq", true), ("red", "sq", true), ("red", "sq", true),
      ("red", "sq", false),
      ("blue", "sq", true),
      ("blue", "sq", false), ("blue", "sq", false),
      ("blue", "sq", false)
    ).toDF("color", "shape", "label")
    val out = Woe.woeTable(rows, Seq("color", "shape"), "label")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getAs[Double]("woe"),
          r.getAs[Double]("iv")))).toMap
    val woeRed = math.log(3.5 / 5) - math.log(1.5 / 5)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("color", "red"))._1 === 3L)
    assert(out(("color", "red"))._2 === 1L)
    assert(out(("color", "red"))._3 === r6(woeRed))
    assert(out(("color", "blue"))._3 === r6(-woeRed))
    // iv = 2 * (0.7 - 0.3) * woe(red), folded on the 1e-6 grid
    assert(out(("color", "red"))._4 === 0.6778)
    assert(out(("shape", "sq"))._3 === 0.0)
    assert(out(("shape", "sq"))._4 === 0.0)

    // a null feature value becomes its own bin
    val withNull = Seq((Option.empty[String], true),
      (Some("x"), false)).toDF("f", "label")
    val nb = Woe.woeTable(withNull, Seq("f"), "label")
      .filter(col("value") === "__null__").count()
    assert(nb === 1L)
  }

  test("targetEncodeLoo: own label excluded, smoothing pulls to the " +
      "prior, singletons get exactly the prior blend") {
    val s = spark
    import s.implicits._
    // cat a: ys 1, 1, 0; cat b: 0; global mu = 0.5
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 0.0), ("b", 0.0))
      .toDF("cat", "y")
    val out = Woe.targetEncodeLoo(df, "cat", "y", m = 2.0)
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getAs[Double]("te")))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // a row with y=1: (2 - 1 + 2*0.5) / (3 - 1 + 2) = 0.5
    // a row with y=0: (2 - 0 + 1) / 4 = 0.75 -> HIGHER than its own
    // label's removal, as LOO demands
    out.filter(r => r._1 == "a" && r._2 == 1.0)
      .foreach(r => assert(r._3 === r6(0.5)))
    out.filter(r => r._1 == "a" && r._2 == 0.0)
      .foreach(r => assert(r._3 === r6(0.75)))
    // singleton b: (0 - 0 + 2*0.5) / (1 - 1 + 2) = 0.5 = the prior
    out.filter(_._1 == "b").foreach(r => assert(r._3 === r6(0.5)))
    // no-leak: permuting one row's label never changes OTHER rows'
    // encodings within a different category
    assert(out.length === 4)
  }

  test("woeNumericGrid: exact quartile cuts on a 1..100 grid, " +
      "pure-sign bins get signed woe") {
    val s = spark
    import s.implicits._
    val rows = (1 to 100).map(i => (i.toDouble, i > 50)).toDF("v", "y")
    val out = Woe.woeNumericGrid(rows, "v", "y")
      .collect().map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getAs[Double]("woe"))))
      .toMap
    assert(out.keySet === Set("q1", "q2", "q3", "q4"))
    // cuts at 25/50/75: 25 rows per bin
    assert(out.values.forall(x => x._1 + x._2 === 25L))
    assert(out("q1")._3 < 0 && out("q2")._3 < 0)
    assert(out("q3")._3 > 0 && out("q4")._3 > 0)
    assert(out("q1")._1 === 0L && out("q4")._2 === 0L)
  }

  test("ivRanking orders informative features first") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("red", "sq", true), ("red", "sq", true), ("red", "sq", true),
      ("red", "sq", false),
      ("blue", "sq", true),
      ("blue", "sq", false), ("blue", "sq", false),
      ("blue", "sq", false)
    ).toDF("color", "shape", "label")
    val ranked = Woe.ivRanking(rows, Seq("color", "shape"), "label")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[Double]("iv")))
    assert(ranked.map(_._1).toSeq === Seq("color", "shape"))
    assert(ranked(0)._2 === 2L)
    assert(ranked(1)._3 === 0.0)
  }
}
