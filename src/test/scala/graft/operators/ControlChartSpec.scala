package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** EWMA chart + SPRT laws: an in-control series never alarms, a level
  * shift alarms shortly after it happens (and the smoothing delay is
  * visible), and Wald's walk decides at exactly the closed-form step
  * count on pure streams while an oscillating stream never decides.
  */
class ControlChartSpec extends SparkSpec {

  test("ewmaControl: the in-control key never alarms; the shifted key " +
      "alarms within a few smoothing steps of the break") {
    val s = spark
    import s.implicits._
    // alternating ±1 around 10 (sd > 0), shift to 20 at t = 60
    val rows = (0 until 100).flatMap { t =>
      Seq(("ok", t, 10.0 + (t % 2)),
        ("shift", t, (if (t < 60) 10.0 else 20.0) + (t % 2)))
    }
    val out = Robust.ewmaControl(rows.toDF("k", "t", "y"), "k", "t",
        "y", lambda = 0.2, l = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_alarms"),
          Option(r.getAs[java.lang.Long]("first_alarm_t"))
            .map(_.toLong)))
      .toMap
    assert(out("ok") === ((0L, None))) // in control reads NULL
    val (alarms, first) = out("shift")
    assert(alarms > 0L)
    // retrospective chart: μ̂/σ̂ come from the WHOLE series (shift
    // included), so the limit is wide and λ = .2 needs ~9 smoothing
    // steps from the break to cross it
    assert(first.exists(f => f >= 60L && f <= 72L),
      s"first alarm at $first")
  }

  test("ewmaControl: under-2-point keys drop (no spread estimable)") {
    val s = spark
    import s.implicits._
    val df = Seq(("one", 0, 1.0), ("two", 0, 1.0), ("two", 1, 3.0))
      .toDF("k", "t", "y")
    assert(Robust.ewmaControl(df, "k", "t", "y", 0.2, 3.0)
      .select("k").collect().map(_.getString(0)).toSet === Set("two"))
  }

  test("inverseNormalCdf: textbook quantiles to 1e-8, symmetric, " +
      "zero at the median; powerAnalysis follows the 1/mde^2 law " +
      "and the hand-computed n") {
    assert(math.abs(Abtest.inverseNormalCdf(0.975) - 1.95996398) < 1e-7)
    assert(math.abs(Abtest.inverseNormalCdf(0.8) - 0.84162123) < 1e-7)
    assert(Abtest.inverseNormalCdf(0.5) === 0.0)
    assert(math.abs(Abtest.inverseNormalCdf(0.025) +
      Abtest.inverseNormalCdf(0.975)) < 1e-12)
    assert(math.abs(Abtest.inverseNormalCdf(0.001) + 3.0902323) < 1e-6)

    val s = spark
    import s.implicits._
    // mean 100, alternating ±10: sample var = 6000/59
    val rows = (0 until 60).map(i => ("m", i, 100.0 + (if (i % 2 == 0)
      10.0 else -10.0)))
    val out = Abtest.powerAnalysis(rows.toDF("k", "t", "y"), "k", "y",
        mdes = Seq(0.01, 0.05))
      .collect().map(r => r.getAs[Double]("mde") ->
        (r.getAs[Double]("mean"), r.getAs[Double]("sigma"),
          r.getAs[Long]("n_per_arm"))).toMap
    val (mean, sigma, n5) = out(0.05)
    assert(mean === 100.0)
    assert(math.abs(sigma - math.sqrt(6000.0 / 59)) < 1e-5)
    // hand: n = ceil(2*(1.9599640+0.8416212)^2 * var / 25)
    val expected = math.ceil(2 * math.pow(1.9599640 + 0.8416212, 2) *
      (6000.0 / 59) / 25.0).toLong
    assert(n5 === expected, s"n5 $n5 vs $expected")
    // quartering the MDE multiplies n by ~25 (ceiling slack)
    val n1 = out(0.01)._3
    assert(math.abs(n1 - 25.0 * n5) <= 25.0, s"n1 $n1 vs 25*$n5")
  }

  test("mcNemar closed forms: (|b-c|-1)^2/(b+c) by hand, null when " +
      "no pair is discordant, significance at the chi2(1) line") {
    val s = spark
    import s.implicits._
    def pairs(both: Int, of: Int, os: Int, nei: Int) =
      (Seq.fill(both)((true, true)) ++ Seq.fill(of)((true, false)) ++
        Seq.fill(os)((false, true)) ++ Seq.fill(nei)((false, false)))
        .toDF("a", "b")
    val r1 = Abtest.mcNemar(pairs(10, 5, 1, 4), "a", "b").head()
    assert(r1.getAs[Long]("n_pairs") === 20L)
    assert(r1.getAs[Double]("chi2") === 1.5) // (4-1)^2/6
    assert(!r1.getAs[Boolean]("significant"))
    val r2 = Abtest.mcNemar(pairs(0, 15, 1, 0), "a", "b").head()
    assert(r2.getAs[Double]("chi2") === 10.5625) // 13^2/16
    assert(r2.getAs[Boolean]("significant"))
    val r3 = Abtest.mcNemar(pairs(7, 0, 0, 3), "a", "b").head()
    assert(r3.isNullAt(r3.fieldIndex("chi2")))
    assert(!r3.getAs[Boolean]("significant"))
  }

  test("kruskalWallis closed form: {1,2,3} vs {4,5,6} gives " +
      "H = 3.8571, tie-free correction 1; the all-tied degenerate " +
      "nulls the corrected H") {
    val s = spark
    import s.implicits._
    val df = Seq(("A", 1L, 1.0), ("A", 2L, 2.0), ("A", 3L, 3.0),
      ("B", 4L, 4.0), ("B", 5L, 5.0), ("B", 6L, 6.0))
      .toDF("arm", "id", "y")
    val r = Abtest.kruskalWallis(df, "arm", "id", "y").head()
    assert(r.getAs[Long]("n_total") === 6L)
    assert(r.getAs[Long]("k_arms") === 2L)
    assert(r.getAs[Double]("h") === 3.8571)
    assert(r.getAs[Double]("tie_correction") === 1.0)
    assert(r.getAs[Double]("h_corrected") === 3.8571)
    val tied = Seq(("A", 1L, 5.0), ("A", 2L, 5.0), ("B", 3L, 5.0))
      .toDF("arm", "id", "y")
    val rt = Abtest.kruskalWallis(tied, "arm", "id", "y").head()
    assert(rt.isNullAt(rt.fieldIndex("h_corrected")))
  }

  test("wilcoxonSignedRank closed form: d = {+1,+2,+3,-4} gives " +
      "W+ = 6, z = 1/sqrt(7.5); zero diffs drop from n_nonzero but " +
      "count in n_pairs") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10.0, 11.0), (2L, 10.0, 12.0), (3L, 10.0, 13.0),
      (4L, 10.0, 6.0), (5L, 7.0, 7.0)).toDF("id", "y1", "y2")
    val r = Abtest.wilcoxonSignedRank(df, "id", "y1", "y2").head()
    assert(r.getAs[Long]("n_pairs") === 5L)
    assert(r.getAs[Long]("n_nonzero") === 4L)
    assert(r.getAs[Double]("w_plus") === 6.0)
    assert(math.abs(r.getAs[Double]("z") - 1.0 / math.sqrt(7.5))
      < 1e-4)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("chiSquareIndependence closed form: the 2x2 with all expected " +
      "15 gives chi2 = 20/3, df = 1; a perfectly independent table " +
      "reads 0") {
    val s = spark
    import s.implicits._
    val skewed = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y"))
      ++ Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r", "c")
    val r1 = Abtest.chiSquareIndependence(skewed, "r", "c").head()
    assert(r1.getAs[Long]("n") === 60L)
    assert(r1.getAs[Long]("df") === 1L)
    assert(math.abs(r1.getAs[Double]("chi2") - 20.0 / 3) < 1e-4)
    val indep = (for { r <- Seq("a", "b"); c <- Seq("x", "y", "z") }
      yield Seq.fill(5)((r, c))).flatten.toDF("r", "c")
    val r2 = Abtest.chiSquareIndependence(indep, "r", "c").head()
    assert(r2.getAs[Double]("chi2") === 0.0)
    assert(r2.getAs[Long]("df") === 2L)
  }

  test("chiSquareIndependence on a SPARSE table: the absent (b,y) " +
      "cell still contributes its (0-e)^2/e = e term (scipy " +
      "chi2_contingency(correction=False) on [[10,5],[5,0]] = 20/9)") {
    val s = spark
    import s.implicits._
    // marginals: rows (15, 5), cols (15, 5), N = 20; e(b,y) = 1.25;
    // chi2 = 1.5625/11.25 + 1.5625/3.75 + 1.5625/3.75 + 1.5625/1.25
    //      = 20/9 — dropping the empty cell would read 0.9722 and
    //      understate the statistic
    val sparse = (Seq.fill(10)(("a", "x")) ++ Seq.fill(5)(("a", "y"))
      ++ Seq.fill(5)(("b", "x"))).toDF("r", "c")
    val r = Abtest.chiSquareIndependence(sparse, "r", "c").head()
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Long]("r_levels") === 2L)
    assert(r.getAs[Long]("c_levels") === 2L)
    assert(r.getAs[Long]("df") === 1L)
    assert(math.abs(r.getAs[Double]("chi2") - 20.0 / 9) < 1e-4)
  }

  test("sprtFrom: resume(sprt(A), B) == sprt(A ++ B) exactly — keys " +
      "deciding in A, across the boundary, never, and debuting in B") {
    val s = spark
    import s.implicits._
    def alt(i: Int) = i % 3 != 0 // 2/3 success — decides eventually
    val all =
      (0 until 40).map(i => ("early", i, true)) ++ // decides in A
      (0 until 120).map(i => ("late", i, alt(i))) ++ // decides in B
      (0 until 120).map(i => ("flip", i, i % 2 == 0)) ++ // never
      (60 until 120).map(i => ("debut", i, false)) // debuts in B
    val (a, b) = (all.filter(_._2 < 60), all.filter(_._2 >= 60))
    def run(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_total"),
        r.getAs[Long]("n_success"), r.getAs[String]("decision"),
        r.getAs[Long]("n_at_decision"), r.getAs[Double]("llr_final")))
      .toMap
    val whole = run(Abtest.sprt(all.toDF("k", "o", "s"), "k", "o",
      "s", 0.45, 0.55, 0.05, 0.05))
    val stA = Abtest.sprt(a.toDF("k", "o", "s"), "k", "o", "s",
      0.45, 0.55, 0.05, 0.05)
    val resumed = run(Abtest.sprtFrom(b.toDF("k", "o", "s"), "k",
      "o", "s", stA, 0.45, 0.55, 0.05, 0.05))
    assert(resumed === whole)
    assert(whole("early")._3 === "reject_h0")
    assert(whole("flip")._3 === "continue")
    assert(whole.keySet ===
      Set("early", "late", "flip", "debut"))
  }

  test("sprt: pure streams decide at the closed-form step count " +
      "(ceil(ln(19)/|step|) = 15 at p .45 vs .55, α = β = .05); an " +
      "alternating stream never decides") {
    val s = spark
    import s.implicits._
    val rows = (0 until 100).flatMap { i =>
      Seq(("allwin", i, true), ("alllose", i, false),
        ("flip", i, i % 2 == 0))
    }
    val out = Abtest.sprt(rows.toDF("k", "o", "s"), "k", "o", "s",
        p0 = 0.45, p1 = 0.55, alpha = 0.05, beta = 0.05)
      .collect().map(r => r.getString(0) ->
        (r.getAs[String]("decision"), r.getAs[Long]("n_at_decision")))
      .toMap
    assert(out("allwin") === (("reject_h0", 15L)))
    assert(out("alllose") === (("accept_h0", 15L)))
    assert(out("flip") === (("continue", -1L)))
    // frozen state: the decided walk ignores the 85 later outcomes
    val early = Abtest.sprt(
      rows.filter(r => r._1 == "allwin" && r._2 < 15)
        .toDF("k", "o", "s"),
      "k", "o", "s", 0.45, 0.55, 0.05, 0.05).head()
    assert(early.getAs[String]("decision") === "reject_h0")
    val full = Abtest.sprt(
      rows.filter(_._1 == "allwin").toDF("k", "o", "s"),
      "k", "o", "s", 0.45, 0.55, 0.05, 0.05).head()
    assert(full.getAs[Double]("llr_final") ===
      early.getAs[Double]("llr_final"))
  }
}
