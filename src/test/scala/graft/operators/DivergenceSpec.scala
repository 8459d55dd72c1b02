package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Token-distribution divergence: hand-computed smoothed KL/JS, the
  * zero-divergence identity, JS symmetry and its ln 2 bound, and the
  * outlier-ordering property the diagnostic exists for.
  */
class DivergenceSpec extends SparkSpec {

  test("hand-computed KL/JS between disjoint two-token tables") {
    val s = spark
    import s.implicits._
    val p = Seq(("a", 2L)).toDF("token", "c")
    val q = Seq(("b", 2L)).toDF("token", "c")
    val r = Divergence.divergence(p, q, "token", "c").head()
    // V=2, Np=Nq=2, α=.5: p=(2.5/3, .5/3) vs q=(.5/3, 2.5/3)
    val pa = 2.5 / 3; val pb = 0.5 / 3
    val kl = pa * math.log(pa / pb) + pb * math.log(pb / pa)
    val js = (pa * math.log(2 * pa / (pa + pb))
      + pb * math.log(2 * pb / (pa + pb))) / 2 * 2 // two symmetric tokens
    assert(r.getAs[Long]("n_p") === 2L && r.getAs[Long]("n_q") === 2L)
    assert(r.getAs[Double]("kl_p_q") ===
      BigDecimal(kl).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("js") ===
      BigDecimal(js).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("identical distributions diverge by zero; JS is symmetric") {
    val s = spark
    import s.implicits._
    val p = Seq(("a", 3L), ("b", 1L)).toDF("token", "c")
    val q = Seq(("a", 6L), ("b", 2L)).toDF("token", "c")
    val same = Divergence.divergence(p, p, "token", "c").head()
    assert(same.getAs[Double]("kl_p_q") === 0.0)
    assert(same.getAs[Double]("js") === 0.0)
    // same shape at doubled mass: tiny but nonzero under smoothing
    val scaled = Divergence.divergence(p, q, "token", "c").head()
    assert(math.abs(scaled.getAs[Double]("js")) < 0.01)
    val ab = Divergence.divergence(p, q, "token", "c").head()
      .getAs[Double]("js")
    val ba = Divergence.divergence(q, p, "token", "c").head()
      .getAs[Double]("js")
    assert(ab === ba)
  }

  test("per-group form flags the vocabulary outlier") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "g1", "alpha beta gamma delta alpha beta"),
      (2L, "g2", "alpha beta gamma delta alpha beta"),
      (3L, "g3", "zork quux blarg frobnitz zork quux")
    ).toDF("doc_id", "src", "text")
    val out = Divergence.tokenDivergenceBy(docs, "src", "text")
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    val ln2 = math.log(2)
    out.values.foreach { r =>
      val js = r.getAs[Double]("js_vs_rest")
      assert(js >= 0.0 && js <= ln2 + 1e-9)
      assert(r.getAs[Double]("kl_vs_rest") >= 0.0)
    }
    // g1's complement contains an identical copy of itself (g2) plus
    // noise; g3's complement shares no token with it
    assert(out("g3").getAs[Double]("js_vs_rest") >
      out("g1").getAs[Double]("js_vs_rest"))
    assert(out("g1").getAs[Long]("n_tokens") === 6L)
    assert(out("g1").getAs[Long]("n_vocab") === 4L)
  }

  test("corpus run: every source present, all values finite") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Divergence.tokenDivergenceBy(docs, "source", "text")
      .collect()
    assert(rows.length ===
      docs.select("source").distinct().count().toInt)
    rows.foreach { r =>
      assert(!r.getAs[Double]("kl_vs_rest").isNaN)
      assert(!r.getAs[Double]("js_vs_rest").isInfinite)
    }
  }

  test("psi: identical halves read exactly zero; a planted shift " +
      "crosses the 0.25 alarm; clamp bins catch out-of-range values") {
    val s = spark
    import s.implicits._
    val same = (0 until 10).flatMap(b => (1 to 10).flatMap(_ =>
      Seq((true, b * 5.0), (false, b * 5.0)))).toDF("pre", "v")
    val z = Divergence.psi(same, "v", col("pre"), 0.0, 50.0, 10)
      .head().getAs[Double]("psi")
    assert(z === 0.0)
    val shifted = ((1 to 100).map(_ => (true, 5.0)) ++
      (1 to 100).map(_ => (false, 45.0))).toDF("pre", "v")
    val p = Divergence.psi(shifted, "v", col("pre"), 0.0, 50.0, 10)
      .head().getAs[Double]("psi")
    assert(p > 0.25, s"shift must alarm: $p")
    val clamped = Seq((true, -3.0), (false, 99.0), (true, 25.0))
      .toDF("pre", "v")
    val bins = Divergence.psi(clamped, "v", col("pre"), 0.0, 50.0, 10)
      .collect().map(_.getAs[Int]("bin")).sorted
    assert(bins.toSeq === Seq(-1, 5, 10))
  }

  test("monroeLogOdds: planted distinctive words surface with the " +
      "right sign; the prior shrinks hapaxes below repeated terms") {
    val s = spark
    import s.implicits._
    val filler = "the data of and in a system model is on"
    val docs = (1 to 30).map { i =>
      if (i % 2 == 0) (i.toLong, true, s"$filler cat cat cat" +
        (if (i == 2) " uniqua" else ""))
      else (i.toLong, false, s"$filler dog dog dog")
    }.toDF("id", "a", "text")
    val out = Divergence.monroeLogOdds(docs, "text", col("a"),
        "A", "B", alpha0 = 100.0, topK = 5)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Double]("z")))
    val aSide = out.filter(_._1 == "A")
    val bSide = out.filter(_._1 == "B")
    assert(aSide.exists(_._2 == "cat"))
    assert(bSide.exists(_._2 == "dog"))
    assert(aSide.find(_._2 == "cat").get._3 > 0)
    assert(bSide.find(_._2 == "dog").get._3 < 0)
    // the hapax "uniqua" (1 occurrence, A-only) must score far below
    // the repeated "cat" — the informative prior at work
    val zCat = aSide.find(_._2 == "cat").get._3
    val zUniqua = out.find(_._2 == "uniqua").map(_._3).getOrElse(0.0)
    assert(zUniqua < zCat / 2,
      s"prior should shrink the hapax: uniqua=$zUniqua cat=$zCat")
  }

  test("wasserstein1By: hand-computed transport cost vs the rest") {
    val s = spark
    import s.implicits._
    // A = {0, 1}, B = {1, 2}: W1 = ∫|F_A − F_B| = .5·1 + .5·1 = 1
    val df = Seq(("A", 0L), ("A", 1L), ("B", 1L), ("B", 2L))
      .toDF("g", "v")
    val out = Divergence.wasserstein1By(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("w1_vs_rest"))))
      .toMap
    assert(out === Map("A" -> ((2L, 1.0)), "B" -> ((2L, 1.0))))
  }

  test("wasserstein1By: identical groups sit at zero; a constant " +
      "shift moves W1 by exactly the shift") {
    val s = spark
    import s.implicits._
    val same = Seq(("A", 3L), ("A", 7L), ("B", 3L), ("B", 7L))
      .toDF("g", "v")
    val z = Divergence.wasserstein1By(same, "g", "v")
      .collect().map(_.getAs[Double]("w1_vs_rest"))
    assert(z.forall(_ === 0.0))
    // B = A + 10 pointwise → W1 = 10 (mass 2 each side)
    val shift = Seq(("A", 3L), ("A", 7L), ("B", 13L), ("B", 17L))
      .toDF("g", "v")
    val w = Divergence.wasserstein1By(shift, "g", "v")
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("w1_vs_rest")).toMap
    assert(w === Map("A" -> 10.0, "B" -> 10.0))
  }

  test("wasserstein1By: unequal masses weight the CDF gap — one far " +
      "outlier among many moves W1 a little") {
    val s = spark
    import s.implicits._
    // A = {0,0,0} vs rest B = {0,0,100}
    val df = Seq(("A", 0L), ("A", 0L), ("A", 0L),
      ("B", 0L), ("B", 0L), ("B", 100L)).toDF("g", "v")
    val out = Divergence.wasserstein1By(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("w1_vs_rest")).toMap
    // |F_A(0) − F_B(0)| = |1 − 2/3| = 1/3 over the gap of 100
    assert(out === Map(
      "A" -> 33.333333, "B" -> 33.333333))
  }

  test("wasserstein1By: a group owning the whole corpus reads NULL — " +
      "there is no rest to compare against") {
    val s = spark
    import s.implicits._
    val df = Seq(("A", 1L), ("A", 5L)).toDF("g", "v")
    val row = Divergence.wasserstein1By(df, "g", "v").head()
    assert(row.isNullAt(row.fieldIndex("w1_vs_rest")))
  }

  test("wasserstein1 (two-sample): histogram weights count — doubled " +
      "counts leave W1 unchanged, and the two-sample number equals " +
      "the group-vs-rest core on the same split") {
    val s = spark
    import s.implicits._
    val p = Seq((0L, 1L), (1L, 1L)).toDF("v", "c") // {0, 1}
    val q = Seq((1L, 1L), (2L, 1L)).toDF("v", "c") // {1, 2}
    val r = Divergence.wasserstein1(p, q, "v", "c").head()
    assert(r.getAs[Long]("n_p") === 2L && r.getAs[Long]("n_q") === 2L)
    assert(r.getAs[Double]("w1") === 1.0)
    // scale invariance of the empirical CDFs: q at 10× the mass
    val q10 = Seq((1L, 10L), (2L, 10L)).toDF("v", "c")
    assert(Divergence.wasserstein1(p, q10, "v", "c").head()
      .getAs[Double]("w1") === 1.0)
    // two-sample == the by-group core run on the tagged rows
    val byG = Divergence.wasserstein1By(
      Seq(("p", 0L), ("p", 1L), ("q", 1L), ("q", 2L)).toDF("g", "v"),
      "g", "v").filter(col("g") === "p").head()
    assert(byG.getAs[Double]("w1_vs_rest") === r.getAs[Double]("w1"))
  }
}
