package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class SurvivalAbtestSpec extends SparkSpec {

  private lazy val sqlImplicits = spark.implicits
  import sqlImplicits._

  test("Kaplan–Meier hand fixture: risk sets, censoring, product") {
    val subjects = Seq(
      ("g", 1L, true), ("g", 1L, false), ("g", 2L, true),
      ("g", 3L, true), ("g", 3L, true), ("g", 4L, false)
    ).toDF("seg", "dur", "ev")
    val km = Survival.kaplanMeier(subjects, "seg", "dur", "ev")
      .orderBy("t").collect()
    // t=4 has no events -> no row
    assert(km.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
    assert(km.map(_.getLong(2)).toSeq === Seq(6L, 4L, 3L)) // n_risk
    assert(km.map(_.getLong(3)).toSeq === Seq(1L, 1L, 2L)) // n_events
    // S: 5/6=0.8333, *3/4=0.625, *1/3=0.2083
    assert(km.map(_.getDouble(5)).toSeq === Seq(0.8333, 0.625, 0.2083))
  }

  test("censoring matters: censored subjects leave the risk set, " +
      "they are never counted as events") {
    // same durations, but the t=1 censored subject flipped to an event
    val censored = Seq(("g", 1L, true), ("g", 1L, false), ("g", 2L, true))
      .toDF("seg", "dur", "ev")
    val churnedAll = Seq(("g", 1L, true), ("g", 1L, true), ("g", 2L, true))
      .toDF("seg", "dur", "ev")
    val sc1 = Survival.kaplanMeier(censored, "seg", "dur", "ev")
      .filter(col("t") === 2).select("survival").head().getDouble(0)
    val sc2 = Survival.kaplanMeier(churnedAll, "seg", "dur", "ev")
      .filter(col("t") === 2).select("survival").head().getDouble(0)
    // censored: S(1)=2/3, S(2)=2/3*0 ... n_risk at 2 is 1, d=1 -> 0
    // churned-all: S(1)=1/3, S(2)=0 — survival at t=1 differs
    assert(sc1 === 0.0 && sc2 === 0.0)
    val s11 = Survival.kaplanMeier(censored, "seg", "dur", "ev")
      .filter(col("t") === 1).select("survival").head().getDouble(0)
    val s12 = Survival.kaplanMeier(churnedAll, "seg", "dur", "ev")
      .filter(col("t") === 1).select("survival").head().getDouble(0)
    assert(s11 === 0.6667 && s12 === 0.3333)
  }

  test("groups are independent curves") {
    val subjects = Seq(
      ("a", 1L, true), ("a", 2L, true),
      ("b", 1L, true), ("b", 1L, true), ("b", 5L, false)
    ).toDF("seg", "dur", "ev")
    val km = Survival.kaplanMeier(subjects, "seg", "dur", "ev")
    assert(km.filter(col("seg") === "a" && col("t") === 1)
      .head().getLong(2) === 2L)
    assert(km.filter(col("seg") === "b" && col("t") === 1)
      .head().getLong(2) === 3L)
  }

  test("activitySubjects: duration, churn vs horizon, first-event segment") {
    val ev = Seq(
      // user 1: active to the horizon (censored), first event 'view'
      (1L, "2024-01-01 00:00:00", "view", 1L),
      (1L, "2024-01-30 00:00:00", "click", 2L),
      // user 2: last seen day 3, horizon is day 30 -> churned
      (2L, "2024-01-01 00:00:00", "signup", 3L),
      (2L, "2024-01-04 00:00:00", "view", 4L)
    ).toDF("user_id", "s", "event_type", "event_id")
      .withColumn("ts", to_timestamp(col("s")))
    val subj = Survival.activitySubjects(ev, "user_id", "ts", "event_id",
      col("event_type"), inactiveDays = 7)
      .orderBy("user_id").collect()
    assert(subj(0).getString(1) === "view")
    assert(subj(0).getLong(2) === 29L && !subj(0).getBoolean(3))
    assert(subj(1).getString(1) === "signup")
    assert(subj(1).getLong(2) === 3L && subj(1).getBoolean(3))
  }

  test("conversionSubjects: in-window event, late converter censored " +
      "AT the window, never-converter censored") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", "view", 1L),
      (1L, "2024-01-03 00:00:00", "purchase", 2L), // day 2: event
      (2L, "2024-01-01 00:00:00", "view", 3L),
      (2L, "2024-01-09 00:00:00", "purchase", 4L), // day 8 > 5: censored
      (3L, "2024-01-01 00:00:00", "click", 5L)      // never: censored
    ).toDF("user_id", "s", "event_type", "event_id")
      .withColumn("ts", to_timestamp(col("s")))
    val subj = Survival.conversionSubjects(ev, "user_id", "ts", "event_id",
      col("event_type"), col("event_type") === "purchase", windowDays = 5)
      .orderBy("user_id").collect()
    assert(subj(0).getLong(2) === 2L && subj(0).getBoolean(3))
    assert(subj(1).getLong(2) === 5L && !subj(1).getBoolean(3))
    assert(subj(2).getLong(2) === 5L && !subj(2).getBoolean(3))
    assert(subj(2).getString(1) === "click")
  }

  test("CUPED: exact θ on a perfectly linear fixture collapses variance") {
    val units = Seq(
      ("t", 0.0, 0.0), ("t", 1.0, 2.0), ("c", 2.0, 4.0), ("c", 3.0, 6.0)
    ).toDF("arm", "x", "y")
    // θ = cov/var = 2 exactly; y_cuped = y − 2(x − 1.5) = 3.0 for all
    val adj = Abtest.cupedAdjust(units, "x", "y")
      .select("y_cuped").collect().map(_.getDouble(0))
    assert(adj.forall(v => math.abs(v - 3.0) < 1e-9))
    val s = Abtest.cupedSummary(units, "arm", "x", "y")
      .orderBy("arm").collect()
    assert(s.map(_.getString(0)).toSeq === Seq("c", "t"))
    assert(s.forall(_.getDouble(5) === 0.0)) // var_y_cuped
    assert(s.forall(_.getDouble(4) > 0.0))   // var_y
  }

  test("Welch t: hand-computed statistic and Satterthwaite df") {
    val units = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0)).toDF("arm", "y")
    val r = Abtest.welchTTest(units, "arm", "y").head()
    assert(r.getAs[String]("arm_a") === "a")
    assert(r.getAs[Double]("mean_a") === 2.0)
    assert(r.getAs[Double]("mean_b") === 5.0)
    // t = -3/sqrt(1/3 + 5/3) = -2.1213; df = 4/(1/18 + 25/27) = 4.0755
    assert(r.getAs[Double]("t") === -2.1213)
    assert(r.getAs[Double]("df") === 4.0755)
  }

  test("Mann-Whitney: hand-computed U and tie-free z") {
    val units = Seq(("a", 1L, 1.0), ("a", 2L, 2.0),
      ("b", 3L, 3.0), ("b", 4L, 4.0)).toDF("arm", "id", "y")
    val r = Abtest.mannWhitney(units, "arm", "id", "y").head()
    // a's ranks 1,2 -> U = 3 - 3 = 0; mu = 2; sigma = sqrt(4/12*5)
    assert(r.getAs[Double]("u") === 0.0)
    assert(r.getAs[Double]("z") === -1.5492)
  }

  test("log-rank hand fixture: risk sets at pooled times, " +
      "hypergeometric terms, z and chi2") {
    // Arm A: events at 1, 2; censored at 3.  Arm B: event at 1,
    // censored at 2, two events at 3.
    val subjects = Seq(
      ("A", 1L, true), ("A", 2L, true), ("A", 3L, false),
      ("B", 1L, true), ("B", 2L, false), ("B", 3L, true),
      ("B", 3L, true)).toDF("arm", "dur", "ev")
    val r = Survival.logRank(subjects, "arm", "dur", "ev").head()
    assert(r.getAs[String]("arm_a") === "A")
    assert(r.getAs[String]("arm_b") === "B")
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Long]("n_b") === 4L)
    assert(r.getAs[Long]("o_a") === 2L)
    assert(r.getAs[Long]("o_b") === 3L)
    // t=1: d=2 n_a=3 n_b=4 -> E=6/7,      V=2(3/7)(4/7)(5/6)
    // t=2: d=1 n_a=2 n_b=3 -> E=2/5,      V=(2/5)(3/5)
    // t=3: d=2 n_a=1 n_b=2 -> E=2/3,      V=2(1/3)(2/3)(1/2)
    // sums: E=1.9238, V=0.870385, z=0.0817, chi2=0.0067
    assert(r.getAs[Double]("e_a") === 1.9238)
    assert(r.getAs[Double]("z") === 0.0817)
    assert(r.getAs[Double]("chi2") === 0.0067)
  }

  test("log-rank: identical arms give z ~ 0; a clearly dominated arm " +
      "gives a large positive z for the early-dying arm") {
    val same = Seq.tabulate(40) { i =>
      (if (i % 2 == 0) "x" else "y", (i % 5 + 1).toLong, true)
    }.toDF("arm", "dur", "ev")
    val r0 = Survival.logRank(same, "arm", "dur", "ev").head()
    assert(math.abs(r0.getAs[Double]("z")) < 1e-9)

    val split = (Seq.tabulate(20)(i => ("x", 1L + i % 2, true)) ++
      Seq.tabulate(20)(i => ("y", 8L + i % 2, true)))
      .toDF("arm", "dur", "ev")
    val r1 = Survival.logRank(split, "arm", "dur", "ev").head()
    assert(r1.getAs[Double]("z") > 3.0,
      s"early-dying arm must show z >> 0: $r1")
    intercept[IllegalArgumentException] {
      Survival.logRank(same.withColumn("arm",
        concat(col("arm"), (col("dur") % 2).cast("string"))),
        "arm", "dur", "ev").head()
    }
  }

  test("CUPED: pooled mean is invariant, per-arm variance shrinks on " +
      "correlated real-ish data") {
    val rng = new scala.util.Random(7)
    val units = (1 to 400).map { i =>
      val x = rng.nextDouble() * 10
      val arm = if (i % 2 == 0) "t" else "c"
      val lift = if (arm == "t") 0.5 else 0.0
      (arm, x, 3.0 * x + lift + rng.nextGaussian())
    }.toDF("arm", "x", "y")
    val adj = Abtest.cupedAdjust(units, "x", "y")
    val my = adj.agg(sum(col("y")), sum(col("y_cuped"))).head()
    assert(math.abs(my.getDouble(0) - my.getDouble(1)) < 1e-6 * 400)
    val s = Abtest.cupedSummary(units, "arm", "x", "y").collect()
    s.foreach { r =>
      assert(r.getDouble(5) < r.getDouble(4) / 10,
        s"variance should collapse: $r")
    }
  }

  test("diffInDiff: hand-checked 2x2 cells, control drift subtracted, " +
      "unpooled SE") {
    val s = spark
    import s.implicits._
    // each cell: two units at mean±0.5 -> var 0.5 everywhere.
    // treat moves 1 -> 4, control drifts 1 -> 2: did = 3 - 1 = 2;
    // se = sqrt(4 * 0.5/2) = 1; z = 2.
    val units = Seq(
      (true, false, 0.5), (true, false, 1.5),
      (true, true, 3.5), (true, true, 4.5),
      (false, false, 0.5), (false, false, 1.5),
      (false, true, 1.5), (false, true, 2.5)
    ).toDF("treat", "post", "y")
    val r = Abtest.diffInDiff(units, "treat", "post", "y").head()
    assert(r.getAs[Long]("n_treat_pre") === 2L)
    assert(r.getAs[Long]("n_ctrl_post") === 2L)
    assert(r.getAs[Double]("mean_treat_post") === 4.0)
    assert(r.getAs[Double]("mean_ctrl_pre") === 1.0)
    assert(r.getAs[Double]("did") === 2.0)
    assert(r.getAs[Double]("se") === 1.0)
    assert(r.getAs[Double]("z") === 2.0)
    // null metric rows drop rather than poisoning a cell
    val withNull = units.union(
      Seq((true, true, Option.empty[Double])).toDF("treat", "post", "y"))
    val r2 = Abtest.diffInDiff(withNull, "treat", "post", "y").head()
    assert(r2.getAs[Double]("did") === 2.0)
    assert(r2.getAs[Long]("n_treat_post") === 2L)
  }

  test("ipwAte: stratum propensities undo confounding the naive " +
      "difference falls for; clipping guards empty cells") {
    val s = spark
    import s.implicits._
    // stratum a: 75% treated, baseline 10, effect +1
    // stratum b: 25% treated, baseline 0, effect +1
    // true ATE = 1; naive mixes baselines -> 6.0
    val units = Seq(
      ("a", true, 11.0), ("a", true, 11.0), ("a", true, 11.0),
      ("a", false, 10.0),
      ("b", true, 1.0),
      ("b", false, 0.0), ("b", false, 0.0), ("b", false, 0.0)
    ).toDF("seg", "treat", "y")
    val out = Abtest.ipwAte(units, Seq("seg"), "treat", "y")
      .orderBy("seg").collect()
    assert(out.length === 2)
    val r = out.head
    assert(r.getAs[Double]("naive_diff") === 6.0)
    assert(r.getAs[Double]("ate_ipw") === 1.0)
    assert(r.getAs[Double]("ate_hajek") === 1.0)
    assert(r.getAs[Double]("e") === 0.75)
    assert(out(1).getAs[Double]("e") === 0.25)
    // an all-treated stratum clips to 0.98 instead of dividing by 0
    val degenerate = Seq(("c", true, 5.0), ("c", true, 5.0))
      .toDF("seg", "treat", "y")
    val d = Abtest.ipwAte(degenerate, Seq("seg"), "treat", "y").head()
    assert(d.getAs[Double]("e") === 0.98)
  }

  test("proportionTest: pooled-SE z on a hand case; degenerate pool " +
      "yields null z") {
    val s = spark
    import s.implicits._
    val units = ((1 to 100).map(i => ("a", i <= 30)) ++
      (1 to 100).map(i => ("b", i <= 20))).toDF("arm", "s")
    val r = Abtest.proportionTest(units, "arm", "s").head()
    assert(r.getAs[Double]("p_a") === 0.3)
    assert(r.getAs[Double]("p_b") === 0.2)
    assert(r.getAs[Double]("diff") === 0.1)
    // pool .25 -> se = sqrt(.25*.75*.02) = .0612372; z = 1.633
    assert(r.getAs[Double]("z") === 1.633)
    val degen = ((1 to 5).map(_ => ("a", true)) ++
      (1 to 5).map(_ => ("b", true))).toDF("arm", "s")
    val d = Abtest.proportionTest(degen, "arm", "s").head()
    assert(d.isNullAt(d.fieldIndex("z")))
  }

  test("ksTest: hand-computed D with smallest-value tie, identical " +
      "samples read zero, a planted shift rejects") {
    val s = spark
    import s.implicits._
    // F_a jumps at 1,2,3; F_b at 3,4,5: D = 2/3 at v=2 AND v=3 ->
    // the tie reports the smaller value
    val ab = (Seq(1, 2, 3).map(v => (true, v.toDouble)) ++
      Seq(3, 4, 5).map(v => (false, v.toDouble)))
      .toDF("a", "v")
    val r = Abtest.ksTest(ab, col("a"), "v").head()
    assert(r.getAs[Long]("n_a") === 3L)
    assert(r.getAs[Double]("d") === 0.666667)
    assert(r.getAs[Double]("v_at_d") === 2.0)
    // identical samples: D = 0 at the smallest value
    val same = (Seq(1, 2).map(v => (true, v.toDouble)) ++
      Seq(1, 2).map(v => (false, v.toDouble))).toDF("a", "v")
    val r0 = Abtest.ksTest(same, col("a"), "v").head()
    assert(r0.getAs[Double]("d") === 0.0)
    assert(r0.getAs[Double]("v_at_d") === 1.0)
    assert(!r0.getAs[Boolean]("reject_05"))
    // 300 vs 300 with a unit shift: far past the 0.05 line
    val big = ((1 to 300).map(i => (true, (i % 10).toDouble)) ++
      (1 to 300).map(i => (false, (i % 10 + 3).toDouble))).toDF("a", "v")
    val rb = Abtest.ksTest(big, col("a"), "v").head()
    assert(rb.getAs[Boolean]("reject_05"))
    assert(rb.getAs[Double]("d") === 0.3)
  }

  test("KM long-curve accuracy: 1000 distinct event times match the " +
      "closed-form survival at 4 dp (the 1e-9 grid's point — the old " +
      "1e-6 grid drifted up to T·5e-7 ≈ 5e-4 here and flipped digits)") {
    val s = spark
    import s.implicits._
    // one event at each t = 1..1000 over 1000 subjects:
    // S(t) = Π_{u<=t} (1 - 1/(1000-u+1)) telescopes to (1000-t)/1000
    val subjects = (1 to 1000).map(t => ("g", t.toLong, true))
      .toDF("grp", "dur", "ev")
    val km = Survival.kaplanMeier(subjects, "grp", "dur", "ev")
      .collect().map(r => r.getAs[Long]("t") ->
        r.getAs[Double]("survival")).toMap
    assert(km.size === 1000)
    (1 to 999).foreach { t =>
      val exact = (1000.0 - t) / 1000.0
      val got = km(t.toLong)
      assert(math.abs(got - math.rint(exact * 1e4) / 1e4) < 1e-12,
        s"t=$t got=$got exact=$exact")
    }
    // the final event exhausts the risk set: survival absorbs at 0
    assert(km(1000L) === 0.0)
  }
}
