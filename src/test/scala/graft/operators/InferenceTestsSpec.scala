package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the classical-inference completions:
  * one-way ANOVA F, Brown–Forsythe, Friedman (q367–q369).
  */
class InferenceTestsSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  test("anovaF: textbook two-arm decomposition, exact SS and F") {
    // A: 1,2,3 (mean 2)  B: 2,4,6 (mean 4); grand mean 3
    // SSB = 3·1 + 3·1 = 6; SSW = 2 + 8 = 10; F = (6/1)/(10/4) = 2.4
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0),
      ("B", 4L, 2.0), ("B", 5L, 4.0), ("B", 6L, 6.0))
      .toDF("arm", "id", "y")
    val r = Abtest.anovaF(df, "arm", "id", "y", scale = 0).collect()(0)
    assert(r.getAs[Long]("n_total") === 6L)
    assert(r.getAs[Long]("k_arms") === 2L)
    assert(r.getAs[Long]("df_between") === 1L)
    assert(r.getAs[Long]("df_within") === 4L)
    assert(r.getAs[Double]("ss_between") === 6.0)
    assert(r.getAs[Double]("ss_within") === 10.0)
    assert(r.getAs[Double]("f_stat") === 2.4)
    assert(r.getAs[Double]("eta_sq") === 0.375)
  }

  test("anovaF: zero within-variance nulls F, keeps SS") {
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 1.0),
      ("B", 3L, 5.0), ("B", 4L, 5.0)).toDF("arm", "id", "y")
    val r = Abtest.anovaF(df, "arm", "id", "y", scale = 0).collect()(0)
    assert(r.getAs[Double]("ss_within") === 0.0)
    assert(r.isNullAt(r.fieldIndex("f_stat")))
    assert(r.getAs[Double]("eta_sq") === 1.0)
  }

  test("brownForsythe: odd-count medians, F on |y - med| " +
      "(doubled grid, F scale-invariant)") {
    // A: 1,2,3 (med 2, z = 1,0,1)  B: 2,4,6 (med 4, z = 2,0,2)
    // F over z: SSB = 8/3, SSW = 40/3, F = (8/3)/(40/12) = 0.8
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0),
      ("B", 4L, 2.0), ("B", 5L, 4.0), ("B", 6L, 6.0))
      .toDF("arm", "id", "y")
    val r = Abtest.brownForsythe(df, "arm", "id", "y", scale = 0)
      .collect()(0)
    assert(r.getAs[Double]("f_stat") === 0.8)
    assert(r.getAs[Long]("df_between") === 1L)
    assert(r.getAs[Long]("df_within") === 4L)
  }

  test("brownForsythe: even-count median is the exact midpoint; " +
      "all-constant deviations null F") {
    // A: 1,3 (med 2 → z2 = 2,2)  B: 10,10 (med 10 → z2 = 0,0)
    // deviations constant per arm → SSW = 0 → F null; SSB = 4
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 3.0),
      ("B", 3L, 10.0), ("B", 4L, 10.0)).toDF("arm", "id", "y")
    val r = Abtest.brownForsythe(df, "arm", "id", "y", scale = 0)
      .collect()(0)
    assert(r.getAs[Double]("ss_between") === 4.0)
    assert(r.getAs[Double]("ss_within") === 0.0)
    assert(r.isNullAt(r.fieldIndex("f_stat")))
  }

  private val friedmanBase = Seq(
    // three complete blocks, treatment effect a < b < c, no ties:
    // every block ranks a=1, b=2, c=3 → chi2 = 6, W = 1
    ("b1", "a", 1.0), ("b1", "b", 2.0), ("b1", "c", 3.0),
    ("b2", "a", 2.0), ("b2", "b", 4.0), ("b2", "c", 6.0),
    ("b3", "a", 1.0), ("b3", "b", 3.0), ("b3", "c", 5.0))

  test("friedman: perfect agreement gives chi2 = 2n, W = 1") {
    val df = friedmanBase.toDF("block", "arm", "y")
    val r = Abtest.friedman(df, "block", "arm", "y").collect()(0)
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Long]("k_arms") === 3L)
    assert(r.getAs[Long]("df") === 2L)
    assert(r.getAs[Double]("chi2") === 6.0)
    assert(r.getAs[Double]("kendall_w") === 1.0)
  }

  test("friedman: incomplete blocks drop without changing the stat") {
    val df = (friedmanBase ++ Seq(("b4", "a", 9.0), ("b4", "b", 1.0)))
      .toDF("block", "arm", "y")
    val r = Abtest.friedman(df, "block", "arm", "y").collect()(0)
    assert(r.getAs[Long]("n_blocks") === 3L)
    assert(r.getAs[Double]("chi2") === 6.0)
  }

  test("friedman: fully tied blocks null the statistic") {
    val df = Seq(
      ("b1", "a", 1.0), ("b1", "b", 1.0), ("b1", "c", 1.0),
      ("b2", "a", 2.0), ("b2", "b", 2.0), ("b2", "c", 2.0))
      .toDF("block", "arm", "y")
    val r = Abtest.friedman(df, "block", "arm", "y").collect()(0)
    assert(r.getAs[Long]("n_blocks") === 2L)
    assert(r.isNullAt(r.fieldIndex("chi2")))
  }

  test("welchAnova: hand-computed two-arm Welch F* and df2") {
    // A: 1,2,3 (m=2, v=1, w=3)  B: 2,4,6 (m=4, v=4, w=0.75)
    // W=3.75, m̄=2.4, A=2.4; k=2 → F*=A=2.4; Λ=0.34 → df2=3/1.02
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0),
      ("B", 4L, 2.0), ("B", 5L, 4.0), ("B", 6L, 6.0))
      .toDF("arm", "id", "y")
    val r = Abtest.welchAnova(df, "arm", "id", "y", scale = 0)
      .collect()(0)
    assert(r.getAs[Long]("n_total") === 6L)
    assert(r.getAs[Long]("df1") === 1L)
    assert(r.getAs[Double]("f_stat") === 2.4)
    assert(r.getAs[Double]("df2") === 2.9412)
  }

  test("welchAnova: a zero-variance arm nulls F (w undefined) — " +
      "where anovaF would still report") {
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 2.0),
      ("B", 3L, 5.0), ("B", 4L, 5.0)).toDF("arm", "id", "y")
    val r = Abtest.welchAnova(df, "arm", "id", "y", scale = 0)
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("f_stat")))
    assert(r.isNullAt(r.fieldIndex("df2")))
  }

  test("pairwiseWelch: all unordered pairs, hand-checked z, n<2 " +
      "sides null their pair") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 2.0), ("B", 4.0), ("B", 6.0), ("C", 10.0))
      .toDF("arm", "y")
    val out = Abtest.pairwiseWelch(df, "arm", "y", scale = 0)
      .collect().map(r => r.getAs[String]("pair") -> r).toMap
    assert(out.keySet === Set("A|B", "A|C", "B|C"))
    val ab = out("A|B")
    assert(ab.getAs[Double]("diff") === -2.0)
    // z = −2 / sqrt(1/3 + 4/3) = −1.5492
    assert(ab.getAs[Double]("z") === -1.5492)
    assert(ab.getAs[Double]("p") > 0.1 && ab.getAs[Double]("p") < 0.2)
    assert(out("A|C").isNullAt(out("A|C").fieldIndex("z")))
    assert(out("B|C").isNullAt(out("B|C").fieldIndex("z")))
  }

  test("cochranQ: textbook hand computation, missing cells read 0, " +
      "all-constant blocks null the statistic") {
    // b1: 1,1,0  b2: 1,0,0  b3: 1,1,1  b4: 0,0,0
    // C = (3,2,1), T = 6, ΣR² = 14 → Q = 2·(9+0+9)/(3·4) = 3
    val df = Seq(
      ("b1", "x", 1L), ("b1", "y", 1L), ("b1", "z", 0L),
      ("b2", "x", 1L), ("b2", "y", 0L), ("b2", "z", 0L),
      ("b3", "x", 1L), ("b3", "y", 1L), ("b3", "z", 1L),
      ("b4", "x", 0L), ("b4", "y", 0L), ("b4", "z", 0L))
      .toDF("block", "arm", "x")
    val r = Abtest.cochranQ(df, "block", "arm", "x").collect()(0)
    assert(r.getAs[Long]("n_blocks") === 4L)
    assert(r.getAs[Long]("k_arms") === 3L)
    assert(r.getAs[Long]("df") === 2L)
    assert(r.getAs[Double]("q_stat") === 3.0)
    // drop b4's explicit zeros — the grid completion restores them
    val sparse = df.filter(col("block") =!= "b4" || col("x") =!= 0L)
      .union(Seq(("b4", "x", 0L)).toDF("block", "arm", "x"))
    val r2 = Abtest.cochranQ(sparse, "block", "arm", "x").collect()(0)
    assert(r2.getAs[Long]("n_blocks") === 4L)
    assert(r2.getAs[Double]("q_stat") === 3.0)
    // every block all-1 → zero denominator → null
    val tied = Seq(("b1", "x", 1L), ("b1", "y", 1L),
      ("b2", "x", 1L), ("b2", "y", 1L)).toDF("block", "arm", "x")
    val r3 = Abtest.cochranQ(tied, "block", "arm", "x").collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("q_stat")))
  }

  test("friedman: midrank ties, hand-computed Conover statistic") {
    // b1: a=1, b=1, c=2 → doubled midranks a,b = 3, c = 6
    // b2: a=1, b=2, c=3 → doubled 2, 4, 6
    // R2: a=5, b=7, c=12; ΣR2² = 25+49+144 = 218; sumRsq = 54.5
    // a2 = (9+9+36 + 4+16+36)/4 = 110/4 = 27.5
    // num = 54.5 − 4·3·16/4 = 6.5; den = 27.5 − 2·3·16/4 = 3.5
    // chi2 = 2·6.5/3.5 = 3.714285…, W = chi2/(2·2) = 0.928571…
    val df = Seq(
      ("b1", "a", 1.0), ("b1", "b", 1.0), ("b1", "c", 2.0),
      ("b2", "a", 1.0), ("b2", "b", 2.0), ("b2", "c", 3.0))
      .toDF("block", "arm", "y")
    val r = Abtest.friedman(df, "block", "arm", "y").collect()(0)
    assert(r.getAs[Double]("chi2") === 3.7143)
    assert(r.getAs[Double]("kendall_w") === 0.928571)
  }
}
