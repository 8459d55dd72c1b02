package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {

  test("inverse CDF: hand-placed uniforms map to the right multiplicity") {
    val s = spark
    import s.implicits._
    val got = Seq(0.1, 0.5, 0.8, 0.95, 0.985, 0.999, 0.99995)
      .toDF("u")
      .select(col("u"), Bootstrap.poissonWeight(col("u")).as("w"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(0.1) === 0L)     // < e^-1
    assert(got(0.5) === 1L)
    assert(got(0.8) === 2L)
    assert(got(0.95) === 3L)
    assert(got(0.985) === 4L)
    assert(got(0.999) === 5L)
    assert(got(0.99995) === 6L) // capped tail
  }

  test("cut points are the cumulative Poisson(1) CDF") {
    val e = math.exp(-1.0)
    val expect = Seq(e, 2 * e, 2.5 * e, 2.5 * e + e / 6,
      2.5 * e + e / 6 + e / 24, 2.5 * e + e / 6 + e / 24 + e / 120)
    Bootstrap.CumPoisson1.zip(expect).foreach { case (c, x) =>
      assert(math.abs(c - x) < 1e-15, s"$c vs $x")
    }
  }

  test("weights are unbiased-ish: mean multiplicity ~ 1 over the grid") {
    val s = spark
    import s.implicits._
    val mean = (0L until 20000L).toDF("id")
      .select(Bootstrap.poissonWeight(
        Bootstrap.pairUniform(col("id"), lit(0L))).as("w"))
      .agg(avg(col("w"))).head().getDouble(0)
    assert(math.abs(mean - 1.0) < 0.02, s"mean weight $mean")
  }

  test("CI brackets the point estimate and is deterministic") {
    val s = spark
    import s.implicits._
    val df = (0L until 400L).map(i => (s"g${i % 2}", i, i % 50))
      .toDF("g", "id", "v")
    val a = Bootstrap.poissonCiOfMean(df, "g", "id", "v", reps = 100)
      .orderBy(col("g")).collect()
    val b = Bootstrap.poissonCiOfMean(df, "g", "id", "v", reps = 100)
      .orderBy(col("g")).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    a.foreach { r =>
      val (est, lo, hi) = (r.getAs[Double]("mean_est"),
        r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
      assert(lo <= est && est <= hi, s"$lo <= $est <= $hi")
      assert(lo < hi, "interval must have width on noisy data")
      assert(r.getAs[Long]("n_reps") === 100L)
    }
  }

  test("null values are excluded; reps < 2 refused") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 1L, Some(10L)), ("g", 2L, None))
      .toDF("g", "id", "v")
    val out = Bootstrap.poissonCiOfMean(df, "g", "id", "v", reps = 10)
      .collect()
    assert(out.length === 1 && out(0).getAs[Long]("n_docs") === 1L)
    intercept[IllegalArgumentException] {
      Bootstrap.poissonCiOfMean(df, "g", "id", "v", reps = 1)
    }
  }
}
