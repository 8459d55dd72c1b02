package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Kappa laws: the textbook 2×2 table in closed form (including
  * NEGATIVE kappa — worse than chance), weighted == unweighted at
  * k = 2, near-miss disagreements score better under the weighted
  * form, and the per-label drill-down localizes the fight.
  */
class AgreementSpec extends SparkSpec {

  private def rated(cells: Seq[(String, String, Int)]) = {
    val s = spark
    import s.implicits._
    cells.flatMap { case (a, b, n) => Seq.fill(n)((a, b)) }
      .toDF("ra", "rb")
  }

  test("2x2 closed form: po = .5, pe = .54, kappa = -.04/.46, and " +
      "the linear-weighted kappa equals the unweighted one at k = 2") {
    val df = rated(Seq(("yes", "yes", 20), ("yes", "no", 10),
      ("no", "yes", 15), ("no", "no", 5)))
    val r = Agreement.cohenKappa(df, "ra", "rb").head()
    assert(r.getAs[Long]("n_items") === 50L)
    assert(r.getAs[Long]("k_labels") === 2L)
    assert(math.abs(r.getAs[Double]("po") - 0.5) < 1e-6)
    assert(math.abs(r.getAs[Double]("pe") - 0.54) < 1e-6)
    assert(math.abs(r.getAs[Double]("kappa") - (-0.04 / 0.46)) < 1e-6)
    assert(r.getAs[Double]("kappa_w") === r.getAs[Double]("kappa"))
  }

  test("ordinal near-misses: all disagreements one bucket apart -> " +
      "weighted kappa strictly beats unweighted") {
    val df = rated(Seq(("b0", "b0", 20), ("b1", "b1", 20),
      ("b2", "b2", 20), ("b0", "b1", 10), ("b1", "b2", 10),
      ("b2", "b1", 10)))
    val r = Agreement.cohenKappa(df, "ra", "rb").head()
    assert(r.getAs[Long]("k_labels") === 3L)
    assert(r.getAs[Double]("kappa_w") > r.getAs[Double]("kappa"),
      s"kappa_w ${r.getAs[Double]("kappa_w")} vs " +
        s"kappa ${r.getAs[Double]("kappa")}")
  }

  test("degenerate single-label alphabet: pe = 1, BOTH kappas read " +
      "null (the weighted ratio would otherwise read a " +
      "defined-looking 0)") {
    val df = rated(Seq(("x", "x", 10)))
    val r = Agreement.cohenKappa(df, "ra", "rb").head()
    assert(r.getAs[Double]("po") === 1.0)
    assert(r.isNullAt(r.fieldIndex("kappa")))
    assert(r.isNullAt(r.fieldIndex("kappa_w")))
  }

  test("labelAgreement localizes: perfect on 'easy', contested on " +
      "'hard'") {
    val df = rated(Seq(("easy", "easy", 30), ("hard", "hard", 5),
      ("hard", "easy", 5), ("easy", "hard", 0)))
    val m = Agreement.labelAgreement(df, "ra", "rb")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_both"), r.getAs[Double]("specific_agreement")))
      .toMap
    assert(m("easy")._1 === 30L)
    // easy: 2*30 / (30 + 35)
    assert(math.abs(m("easy")._2 - 60.0 / 65) < 1e-6)
    // hard: 2*5 / (10 + 5)
    assert(math.abs(m("hard")._2 - 10.0 / 15) < 1e-6)
  }

  test("fleissKappa closed forms: hand-computed 2x2 disagreement " +
      "(kappa = -1/3), perfect agreement (kappa = 1), and the " +
      "unequal-m guard fails fast") {
    val s = spark
    import s.implicits._
    // i1 rated (a,a), i2 rated (a,b): P̄ = .5, Pe = .625, κ = -1/3
    val mixed = Seq((1, "a"), (1, "a"), (2, "a"), (2, "b"))
      .toDF("item", "lab")
    val r = Agreement.fleissKappa(mixed, "item", "lab").head()
    assert(r.getAs[Long]("n_items") === 2L)
    assert(r.getAs[Long]("m_raters") === 2L)
    assert(math.abs(r.getAs[Double]("p_bar") - 0.5) < 1e-6)
    assert(math.abs(r.getAs[Double]("p_e") - 0.625) < 1e-6)
    assert(math.abs(r.getAs[Double]("kappa") - (-1.0 / 3)) < 1e-6)
    val perfect = Seq((1, "a"), (1, "a"), (2, "b"), (2, "b"))
      .toDF("item", "lab")
    assert(math.abs(Agreement.fleissKappa(perfect, "item", "lab")
      .head().getAs[Double]("kappa") - 1.0) < 1e-6)
    intercept[IllegalArgumentException] {
      Agreement.fleissKappa(
        Seq((1, "a"), (1, "a"), (2, "a")).toDF("item", "lab"),
        "item", "lab")
    }
  }

  test("cronbachAlpha closed forms: duplicated items give alpha = 1, " +
      "a perfectly contrarian item zeroes the total variance (null), " +
      "and the ratio matches the hand-computed two-item case") {
    val s = spark
    import s.implicits._
    def battery(rows: Seq[(Int, String, Long)]) =
      rows.toDF("u", "i", "x")
    // identical items: ratio = k·v/(k²·v) = 1/2 -> alpha = 1
    val dup = battery((1 to 4).flatMap(u =>
      Seq((u, "a", u.toLong), (u, "b", u.toLong))))
    val r1 = Agreement.cronbachAlpha(dup, "u", "i", "x").head()
    assert(r1.getAs[Long]("n_units") === 4L)
    assert(r1.getAs[Long]("k_items") === 2L)
    assert(math.abs(r1.getAs[Double]("var_ratio") - 0.5) < 1e-6)
    assert(math.abs(r1.getAs[Double]("alpha") - 1.0) < 1e-6)
    // contrarian second item: totals constant -> undefined, null
    val anti = battery((1 to 4).flatMap(u =>
      Seq((u, "a", u.toLong), (u, "b", 5L - u))))
    val r2 = Agreement.cronbachAlpha(anti, "u", "i", "x").head()
    assert(r2.isNullAt(r2.fieldIndex("alpha")))
    // hand case: a=[1,2,3,4], b=[1,1,4,4]: Σσ² = 5/3 + 3, σ²tot = 26/3
    // -> ratio = (14/3)/(26/3) = 7/13
    val hand = battery(Seq((1, "a", 1L), (2, "a", 2L), (3, "a", 3L),
      (4, "a", 4L), (1, "b", 1L), (2, "b", 1L), (3, "b", 4L),
      (4, "b", 4L)))
    val r3 = Agreement.cronbachAlpha(hand, "u", "i", "x").head()
    val expectRatio = 7.0 / 13
    assert(math.abs(r3.getAs[Double]("var_ratio") - expectRatio) < 1e-6)
    assert(math.abs(r3.getAs[Double]("alpha") -
      2.0 * (1 - expectRatio)) < 1e-6)
  }

  test("null-rated rows drop from the table, not into a null label") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some("a")), ("a", None), ("b", Some("b")))
      .toDF("ra", "rb")
    val r = Agreement.cohenKappa(df, "ra", "rb").head()
    assert(r.getAs[Long]("n_items") === 2L)
  }
}
