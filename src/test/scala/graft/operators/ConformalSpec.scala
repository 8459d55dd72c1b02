package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

/** Conformal laws: held-out coverage lands at/above the 1−α guarantee
  * on a well-behaved synthetic, q̂ is an actual calibration residual,
  * the report is deterministic, and groups absent from a split drop.
  */
class ConformalSpec extends SparkSpec {

  // deterministic heavy-ish synthetic: value = group base + spread
  // driven by a fixed permutation of the row id
  private lazy val data = {
    val s = spark
    import s.implicits._
    (0L until 4000L).map { i =>
      val g = if (i % 2 == 0) "A" else "B"
      val base = if (g == "A") 100.0 else 500.0
      val noise = (graft.functions.DedupFunctions.splitmix64(i) % 1000L)
        .toDouble / 100.0 // in (-10, 10), symmetric-ish
      (i, g, base + noise)
    }.toDF("id", "g", "y")
  }

  test("held-out coverage meets the 1 - alpha guarantee (within " +
      "finite-sample slack) and qhat is an actual calibration residual") {
    val out = Conformal.splitConformalByGroup(data, "id", "g", "y",
      alphaPct = 10)
    val rows = out.collect()
    assert(rows.map(_.getString(0)).toSet === Set("A", "B"))
    rows.foreach { r =>
      val cov = r.getAs[Double]("coverage")
      assert(cov >= 0.85 && cov <= 1.0,
        s"group ${r.getString(0)}: coverage $cov off the 0.9 target")
      assert(r.getAs[Double]("qhat") >= 0.0)
      assert(r.getAs[Long]("n_train") > 0 && r.getAs[Long]("n_cal") > 0
        && r.getAs[Long]("n_test") > 0)
    }
    // qhat exactness: it equals some calibration |residual| on the grid
    val sp = Sampling.assignSplit(data, "id",
      Seq("train" -> 5000, "cal" -> 2500, "test" -> 2500))
    val fit = sp.filter(col("split") === "train").groupBy("g")
      .agg(round(sum(col("y")) / count(lit(1)), 4).as("yhat"))
    val calR = sp.filter(col("split") === "cal").join(fit, "g")
      .select(col("g"), round(abs(col("y") - col("yhat")), 4).as("r"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    rows.foreach { r =>
      assert(calR.contains((r.getString(0), r.getAs[Double]("qhat"))))
    }
  }

  test("deterministic in the data and id: two runs agree exactly") {
    def run() = Conformal.splitConformalByGroup(data, "id", "g", "y")
      .collect().map(_.toSeq).toSeq
    assert(run() === run())
  }

  test("a group absent from a split has no conformal report") {
    val s = spark
    import s.implicits._
    // group C: a single row — cannot appear in all three splits
    val df = data.union(Seq((999999L, "C", 1.0)).toDF("id", "g", "y"))
    val out = Conformal.splitConformalByGroup(df, "id", "g", "y")
      .select("g").collect().map(_.getString(0)).toSet
    assert(out === Set("A", "B"))
  }
}
