package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class RegressionBasketSpec extends SparkSpec {

  test("groupedLinearFit: exact line recovered; degenerate fits null") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // g1: y = 2x + 1 exactly
      ("g1", 0.0, 1.0), ("g1", 1.0, 3.0), ("g1", 2.0, 5.0),
      // g2: single point -> null fit
      ("g2", 4.0, 9.0),
      // g3: constant x -> null fit
      ("g3", 2.0, 1.0), ("g3", 2.0, 7.0)
    ).toDF("g", "x", "y")
    val out = Regression.groupedLinearFit(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), Option(r.getAs[java.lang.Double]("slope")),
          Option(r.getAs[java.lang.Double]("intercept")))).toMap
    assert(out("g1")._1 === 3L)
    assert(math.abs(out("g1")._2.get - 2.0) < 1e-12)
    assert(math.abs(out("g1")._3.get - 1.0) < 1e-12)
    assert(out("g2")._2.isEmpty && out("g2")._3.isEmpty)
    assert(out("g3")._2.isEmpty && out("g3")._3.isEmpty)
  }

  test("basket pairs: hand-counted support/confidence/lift; " +
      "multiplicity collapses; hub baskets excluded") {
    val s = spark
    import s.implicits._
    // baskets: b1{A,B}, b2{A,B}, b3{A,C}, b4{B} + b5 = a 4-item hub
    // (excluded at maxBasketSize=3); A duplicated in b1 must not
    // inflate counts
    val df = Seq(
      (1L, "A"), (1L, "A"), (1L, "B"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"),
      (4L, "B"),
      (5L, "A"), (5L, "B"), (5L, "C"), (5L, "D")
    ).toDF("b", "i")
    val out = Basket.pairAssociations(df, "b", "i",
        maxBasketSize = 3, minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("c_ab"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toMap
    // capped universe: 4 baskets; c_A=3, c_B=3, c_C=1
    val ab = out(("A", "B"))
    assert(ab._1 === 2L)
    assert(math.abs(ab._2 - 0.5) < 1e-12)              // 2/4
    assert(math.abs(ab._3 - 2.0 / 3) < 1e-12)          // 2/3
    assert(math.abs(ab._4 - 2.0 * 4 / (3 * 3)) < 1e-12)
    val ac = out(("A", "C"))
    assert(ac._1 === 1L)
    assert(math.abs(ac._4 - 1.0 * 4 / (3 * 1)) < 1e-12)
    // nothing from the hub basket: no A-D/B-D/C-D pair
    assert(!out.contains(("A", "D")) && !out.contains(("B", "D")))
  }

  test("basket pair generation is an equi-join on the basket key") {
    val s = spark
    import s.implicits._
    val df = (0L until 40L).map(i => (i % 8, s"i${i % 5}")).toDF("b", "i")
    val plan = Basket.pairAssociations(df, "b", "i")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("alsoBought: both orientations ranked per item, co-count " +
      "order with partner tie-break, k caps") {
    val s = spark
    import s.implicits._
    // x co-occurs with y in 3 baskets, with z in 2
    val rows = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "y"),
      (4L, "x"), (4L, "z"), (5L, "x"), (5L, "z")
    ).toDF("b", "i")
    val out = Basket.alsoBought(rows, "b", "i", k = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getString(2), r.getLong(3)))).toMap
    assert(out("x") === ((1, "y", 3L)))  // y beats z on count
    assert(out("y") === ((1, "x", 3L)))  // reverse orientation exists
    assert(out("z") === ((1, "x", 2L)))
    val top2 = Basket.alsoBought(rows, "b", "i", k = 2)
      .filter(col("item") === "x").collect()
      .map(r => (r.getInt(1), r.getString(2)))
    assert(top2.toSeq === Seq((1, "y"), (2, "z")))
  }
}
