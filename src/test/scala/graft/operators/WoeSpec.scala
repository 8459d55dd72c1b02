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
