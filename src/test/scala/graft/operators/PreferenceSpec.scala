package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Bradley–Terry laws: the two-item MLE in closed form (3:1 wins →
  * odds 3:1 → strengths 1 and 1/3 after anchoring), transitive
  * dominance orders strengths, winless items floor at the grid, and
  * the bounded-alphabet guard fires before any iteration.
  */
class PreferenceSpec extends SparkSpec {

  test("two items at 3:1 converge to the closed-form MLE: anchored " +
      "strengths 1.0 and 0.333333 (one grid ulp of 1/3)") {
    val s = spark
    import s.implicits._
    val contests = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")))
      .toDF("winner", "loser")
    val out = Preference.bradleyTerry(contests, "winner", "loser",
        rounds = 10)
      .orderBy("item").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("A", "B"))
    assert(out(0).getAs[Double]("strength") === 1.0)
    assert(out(0).getAs[Long]("n_wins") === 3L)
    assert(out(0).getAs[Long]("n_games") === 4L)
    assert(math.abs(out(1).getAs[Double]("strength") - 1.0 / 3) < 2e-6)
  }

  test("transitive dominance: A beats B beats C -> strengths strictly " +
      "ordered; the winless item floors at the 1e-6 grid, not zero") {
    val s = spark
    import s.implicits._
    val contests = (Seq.fill(4)(("A", "B")) ++ Seq.fill(4)(("B", "C")) ++
      Seq.fill(4)(("A", "C")) ++ Seq(("B", "A")))
      .toDF("winner", "loser")
    val m = Preference.bradleyTerry(contests, "winner", "loser",
        rounds = 20)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("strength"))
      .toMap
    assert(m("A") > m("B") && m("B") > m("C"),
      s"expected A > B > C, got $m")
    assert(m("C") >= 1e-6) // winless C stays a valid denominator
  }

  test("a winless lexicographic head cannot poison the rounds: the " +
      "anchor is the strongest item, so strengths stay in (0, 1], " +
      "terms never underflow, and nothing reads NaN") {
    val s = spark
    import s.implicits._
    // 'a' sorts first and never wins; b dominates
    val contests = (Seq(("b", "a")) ++ Seq.fill(3)(("b", "c")) ++
      Seq(("c", "b"))).toDF("winner", "loser")
    val out = Preference.bradleyTerry(contests, "winner", "loser",
        rounds = 10)
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("strength")).toMap
    assert(out.values.forall(v => !v.isNaN && v > 0 && v <= 1.0),
      s"strengths $out")
    assert(out("b") === 1.0) // the dominant item anchors
    assert(out("b") > out("c") && out("c") > out("a"), s"order $out")
  }

  test("alphabet guards: one item and an oversized alphabet both " +
      "fail fast") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(Seq(("A", "A")).toDF("winner", "loser"),
        "winner", "loser")
    }
    val big = (0 until 70).map(i => (s"i$i", s"j$i"))
      .toDF("winner", "loser")
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(big, "winner", "loser", maxItems = 64)
    }
  }
}
