package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Multiplicity laws: the normal-tail polynomial hits the textbook
  * values, grouped Welch z finds a planted lift, and BH is a true
  * STEP-UP (a failing rank is still rejected when a later rank passes).
  */
class MultiplicitySpec extends SparkSpec {

  test("normalTwoSidedP: p(0) = 1, p(1.96) ~ 0.05, p(2.58) ~ 0.01, " +
      "monotone decreasing in |z|") {
    val s = spark
    import s.implicits._
    val out = Seq(0.0, 1.0, 1.96, 2.58, 4.0).toDF("z")
      .select(col("z"), Multiplicity.normalTwoSidedP(col("z")).as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(0.0) === 1.0)
    assert(math.abs(out(1.96) - 0.05) < 0.001)
    assert(math.abs(out(2.58) - 0.00988) < 0.001)
    val ps = Seq(0.0, 1.0, 1.96, 2.58, 4.0).map(out)
    assert(ps === ps.sorted.reverse)
  }

  test("welchZBy: a planted lift produces a large |z| in its group " +
      "and near-zero z in null groups") {
    val s = spark
    import s.implicits._
    val rows = (0 until 2000).flatMap { i =>
      val noise = (graft.functions.DedupFunctions.splitmix64(i.toLong)
        % 100L).toDouble / 10.0
      Seq(
        ("lifted", (i % 2).toString, 50.0 + noise +
          (if (i % 2 == 1) 30.0 else 0.0)),
        ("null_g", (i % 2).toString, 50.0 + noise))
    }.toDF("g", "arm", "y")
    val out = Multiplicity.welchZBy(rows, "g", "arm", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("z")).toMap
    assert(math.abs(out("lifted")) > 10.0, s"planted lift: $out")
    assert(math.abs(out("null_g")) < 3.0, s"null group: $out")
  }

  test("benjaminiHochberg is a step-up: rank 2 fails its own line but " +
      "is rejected because rank 3 passes; thresholds are i*q/m") {
    val s = spark
    import s.implicits._
    val tests = Seq(("t1", 0.01), ("t2", 0.05), ("t3", 0.055),
      ("t4", 0.2), ("t5", 0.9)).toDF("k", "p")
    val out = Multiplicity.benjaminiHochberg(tests, "p", "k", qPct = 10)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Int]("rank"), r.getAs[Double]("bh_threshold"),
          r.getAs[Boolean]("rejected"))).toMap
    assert(out("t1") === ((1, 0.02, true)))
    assert(out("t2") === ((2, 0.04, true))) // .05 > .04 but rank 3 passes
    assert(out("t3") === ((3, 0.06, true)))
    assert(out("t4") === ((4, 0.08, false)))
    assert(out("t5") === ((5, 0.1, false)))
  }

  test("benjaminiHochberg with nothing passing rejects nothing") {
    val s = spark
    import s.implicits._
    val tests = Seq(("a", 0.5), ("b", 0.9)).toDF("k", "p")
    val out = Multiplicity.benjaminiHochberg(tests, "p", "k", qPct = 10)
      .collect()
    assert(out.forall(!_.getAs[Boolean]("rejected")))
  }

  test("holmBonferroni is a true STEP-DOWN: rejections stop at the " +
      "first failure, no later rank rescues it (the BH contrast)") {
    val s = spark
    import s.implicits._
    // thresholds at alpha 5%, m=4: .0125, .016667, .025, .05
    // p = .01, .02, .03, .04: rank 1 passes, rank 2 FAILS (.02 >
    // .016667) → only rank 1 rejected; BH at q=5% rejects ALL FOUR
    // (rank 4's .04 ≤ .05 rescues everything below)
    val tests = Seq(("a", 0.01), ("b", 0.02), ("c", 0.03),
      ("d", 0.04)).toDF("k", "p")
    val holm = Multiplicity.holmBonferroni(tests, "p", "k",
        alphaPct = 5)
      .collect().map(r => r.getAs[Int]("rank") ->
        r.getAs[Boolean]("rejected")).toMap
    assert(holm === Map(1 -> true, 2 -> false, 3 -> false,
      4 -> false))
    val bh = Multiplicity.benjaminiHochberg(tests, "p", "k", qPct = 5)
      .collect().map(_.getAs[Boolean]("rejected"))
    assert(bh.forall(identity))
  }

  test("holmBonferroni: all passing rejects all, thresholds are " +
      "alpha/(m-k+1)") {
    val s = spark
    import s.implicits._
    val tests = Seq(("a", 0.001), ("b", 0.01), ("c", 0.02),
      ("d", 0.9)).toDF("k", "p")
    val out = Multiplicity.holmBonferroni(tests, "p", "k",
        alphaPct = 5)
      .collect().map(r => r.getAs[Int]("rank") ->
        ((r.getAs[Double]("holm_threshold"),
          r.getAs[Boolean]("rejected")))).toMap
    assert(out(1) === ((0.0125, true)))
    assert(out(2) === ((0.016667, true)))
    assert(out(3) === ((0.025, true)))
    assert(out(4) === ((0.05, false)))
  }

  test("null p sits OUTSIDE the family for both corrections: rank and " +
      "threshold NULL, rejected=false, and the ranked family is " +
      "exactly what it would be without the null rows") {
    val s = spark
    import s.implicits._
    // a degenerate arm (n<2 / zero variance) emits null z -> null p;
    // before the split, Spark's NULLS FIRST order handed it rank 1 and
    // the step-down claimed it significant
    val tests = Seq(("a", Some(0.001)), ("b", Some(0.9)),
      ("deg1", None), ("deg2", None)).toDF("k", "p")
    for (out <- Seq(
        Multiplicity.holmBonferroni(tests, "p", "k", alphaPct = 5),
        Multiplicity.benjaminiHochberg(tests, "p", "k", qPct = 5))) {
      val rows = out.collect().map(r => r.getString(0) ->
        ((Option(r.getAs[Integer]("rank")),
          r.getAs[Boolean]("rejected")))).toMap
      assert(rows("deg1") === ((None, false)))
      assert(rows("deg2") === ((None, false)))
      // family of the 2 real tests: m=2, ranks 1..2 unchanged
      assert(rows("a") === ((Some(Integer.valueOf(1)), true)))
      assert(rows("b")._1 === Some(Integer.valueOf(2)))
    }
  }

  test("an ALL-null family rejects nothing (was: everything)") {
    val s = spark
    import s.implicits._
    val tests = Seq(("x", Option.empty[Double]),
      ("y", Option.empty[Double])).toDF("k", "p")
    val holm = Multiplicity.holmBonferroni(tests, "p", "k", alphaPct = 5)
      .collect()
    assert(holm.length === 2)
    assert(holm.forall(!_.getAs[Boolean]("rejected")))
    assert(holm.forall(_.getAs[Integer]("rank") == null))
  }
}
