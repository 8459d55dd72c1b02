package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Murphy laws: hand-computed two-group decomposition, the identity
  * Brier = reliability − resolution + uncertainty, perfect
  * calibration zeroes reliability, and an unscored group fails loudly.
  */
class CalibrationSpec extends SparkSpec {

  private def frame(rows: Seq[(String, Boolean)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("g", "y")
  }

  test("hand-computed: g1 predicts .8 on an observed .75, g2 .2 on " +
      ".25 -> reliability .0025, identity holds") {
    val s = spark
    import s.implicits._
    val test = frame(
      Seq.fill(3)(("g1", true)) ++ Seq(("g1", false)) ++
        Seq.fill(3)(("g2", false)) ++ Seq(("g2", true)))
    val preds = Seq(("g1", 0.8), ("g2", 0.2)).toDF("g", "p")
    val r = Calibration.murphyDecomposition(test, "g", "y", preds, "p")
      .head()
    assert(r.getAs[Long]("n_items") === 8L)
    assert(r.getAs[Long]("n_groups") === 2L)
    // rel = (4*(.8-.75)^2 + 4*(.2-.25)^2)/8 = .0025
    assert(math.abs(r.getAs[Double]("reliability") - 0.0025) < 1e-6)
    // res = (4*(.75-.5)^2 + 4*(.25-.5)^2)/8 = .0625; unc = .25
    assert(math.abs(r.getAs[Double]("resolution") - 0.0625) < 1e-6)
    assert(math.abs(r.getAs[Double]("uncertainty") - 0.25) < 1e-6)
    val brier = r.getAs[Double]("brier")
    assert(math.abs(brier - (0.0025 - 0.0625 + 0.25)) < 1e-5,
      s"identity broke: $brier")
  }

  test("perfectly calibrated predictions zero the reliability term") {
    val s = spark
    import s.implicits._
    val test = frame(
      Seq.fill(1)(("a", true)) ++ Seq.fill(3)(("a", false)) ++
        Seq.fill(3)(("b", true)) ++ Seq.fill(1)(("b", false)))
    val preds = Seq(("a", 0.25), ("b", 0.75)).toDF("g", "p")
    val r = Calibration.murphyDecomposition(test, "g", "y", preds, "p")
      .head()
    assert(r.getAs[Double]("reliability") === 0.0)
  }

  test("an unscored group fails the audit loudly") {
    val s = spark
    import s.implicits._
    val test = frame(Seq(("a", true), ("zz", false)))
    val preds = Seq(("a", 0.5)).toDF("g", "p")
    val e = intercept[Exception] {
      Calibration.murphyDecomposition(test, "g", "y", preds, "p")
        .collect()
    }
    assert(e.getMessage != null)
  }
}
