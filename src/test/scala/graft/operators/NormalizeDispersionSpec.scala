package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class NormalizeDispersionSpec extends SparkSpec {

  test("quantileNormalize: both sources map onto the pooled scale, " +
      "order-preserving, endpoints exact, singleton degenerates to min") {
    val s = spark
    import s.implicits._
    // source a scores 1..4, source b scores 100..400 (same shape,
    // different scale); pooled sorted = 1,2,3,4,100,200,300,400 (n=8)
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
      ("b", 5L, 100L), ("b", 6L, 200L), ("b", 7L, 300L), ("b", 8L, 400L),
      ("c", 9L, 250L) // singleton source
    ).toDF("source", "doc_id", "v")
    val out = Normalize.quantileNormalize(df, "source", "doc_id", "v")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("normalized")).toMap
    // pooled n=9: sorted = 1,2,3,4,100,200,250,300,400
    // a (ng=4): idx = (r-1)*8/3 -> 0,2,5,8 -> 1,3,200,400
    assert(out(1L) === 1L && out(2L) === 3L)
    assert(out(3L) === 200L && out(4L) === 400L)
    // b (ng=4): same idx trajectory -> the SAME normalized values:
    // that is the point of quantile normalization
    assert(out(5L) === 1L && out(6L) === 3L)
    assert(out(7L) === 200L && out(8L) === 400L)
    // singleton -> pooled min
    assert(out(9L) === 1L)
  }

  test("distinctiveTerms: a source-exclusive token tops its source " +
      "and only over-represented terms appear") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", "zebra zebra zebra common common"),
      ("a", "zebra common"),
      ("b", "common common common yak common"),
      ("b", "yak common common")
    ).toDF("source", "text")
    val out = Keywords.distinctiveTerms(df, "source", "text", topK = 2)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Int]("rn"))
        -> (r.getAs[String]("token"), r.getAs[Long]("count"))).toMap
    assert(out(("a", 1))._1 === "zebra")
    assert(out(("a", 1))._2 === 4L)
    assert(out(("b", 1))._1 === "yak")
    // 'common' is UNDER-represented in a (3 of 7 vs 7 of 7 in b), so
    // it must not appear among a's distinctive terms
    assert(!out.exists { case ((src, _), (tok, _)) =>
      src == "a" && tok == "common" })
  }

  test("entropyProfile: uniform mix maxes normalized entropy, " +
      "single category scores 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"),  // uniform over 4
      (2L, "a"), (2L, "a"), (2L, "a"),              // single category
      (3L, "a"), (3L, "a"), (3L, "a"), (3L, "b")    // skewed
    ).toDF("u", "t")
    val out = Robust.entropyProfile(df, "u", "t")
      .collect().map(r => r.getAs[Long]("u") ->
        (r.getAs[Double]("entropy"), r.getAs[Double]("entropy_norm")))
      .toMap
    assert(out(1L)._1 === BigDecimal(math.log(4)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1L)._2 === 1.0)
    assert(out(2L) === ((0.0, 0.0)))
    assert(out(3L)._2 > 0 && out(3L)._2 < 1)
  }

  test("giniProfile: even split scores 0, total concentration " +
      "approaches (n-1)/n, single member scores 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("even", 1L, 10.0), ("even", 2L, 10.0), ("even", 3L, 10.0),
      ("conc", 4L, 0.0), ("conc", 5L, 0.0), ("conc", 6L, 30.0),
      ("solo", 7L, 5.0),
      ("zero", 8L, 0.0)
    ).toDF("g", "id", "v")
    val out = Robust.giniProfile(df, "g", "id", "v")
      .collect().map(r => r.getAs[String]("g") ->
        Option(r.getAs[java.lang.Double]("gini"))).toMap
    assert(out("even").get === 0.0)
    assert(out("conc").get === BigDecimal(2.0 / 3).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) // (n-1)/n = 2/3
    assert(out("solo").get === 0.0)
    assert(out("zero").isEmpty)
  }

  test("cusumDrift: matches the sequential recurrence exactly") {
    val s = spark
    import s.implicits._
    val xs = Seq(2L, 2L, 2L, 9L, 9L, 2L, 2L, 2L, 9L, 9L, 9L, 9L)
    val df = xs.zipWithIndex.map { case (x, i) => ("g", i, x) }
      .toDF("g", "t", "x")
    val out = Robust.cusumDrift(df, "g", "t", "x", slack = 0.5,
        threshold = 2.0)
      .orderBy(col("t")).collect()
    // reference: the literal recurrence with the same global k
    val n = xs.length
    val mu = xs.sum.toDouble / n
    val sd = math.sqrt(xs.map(x => x.toDouble * x).sum / n - mu * mu)
    val k = mu + 0.5 * sd
    var st = 0.0
    val expect = xs.map { x =>
      st = math.max(0.0, st + (x - k)); st
    }
    out.zip(expect).foreach { case (r, e) =>
      // cusum is reported on the 1e-4 grid
      assert(math.abs(r.getAs[Double]("cusum") - e) < 1e-4,
        s"t=${r.getAs[Int]("t")}")
      assert(r.getAs[Boolean]("drift") === (e >= 2.0 * sd))
    }
    // the burst at the tail must be flagged
    assert(out.last.getAs[Boolean]("drift"))
    assert(!out.head.getAs[Boolean]("drift"))
  }

  test("weightedMedian: threshold on cumulative weight, not row count") {
    val s = spark
    import s.implicits._
    // g: values 1..4 with weight concentrated on 4 -> weighted median 4
    // (plain median would be 2); h: uniform weights -> ordinary lower
    // median; zero/null weights excluded
    val df = Seq(
      ("g", 1L, 1L, 1L), ("g", 2L, 2L, 1L), ("g", 3L, 3L, 1L),
      ("g", 4L, 4L, 10L),
      ("h", 5L, 10L, 2L), ("h", 6L, 20L, 2L),
      ("h", 7L, 30L, 0L)
    ).toDF("g", "id", "v", "w")
    val out = Robust.weightedMedian(df, "g", "id", "v", "w")
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("weighted_median"), r.getAs[Long]("total_weight")))
      .toMap
    assert(out("g") === ((4L, 13L)))
    assert(out("h") === ((10L, 4L))) // cum 2 * 2 >= 4 at the first row
  }

  test("dispersionProfile: a one-hour burst scores c(H-1)/H, a " +
      "metronome scores 0") {
    val s = spark
    import s.implicits._
    def ts(h: Int, m: Int) =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // span: hours 0..3 (H=4). burst: 8 events in hour 0.
    // metronome: 1 event in each hour 0..3.
    val rows =
      (0 until 8).map(i => (1L, ts(0, i))) ++
        (0 until 4).map(h => (2L, ts(h, 30)))
    val df = rows.toDF("user_id", "ts")
    val out = Robust.dispersionProfile(df, "user_id", "ts")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("active_hours"),
          r.getAs[Double]("dispersion"))).toMap
    // burst: mean 2, var = 64/4 - 4 = 12, disp = 6 = 8*(4-1)/4
    assert(out(1L) === ((8L, 1L, 6.0)))
    // metronome: mean 1, var = 4/4 - 1 = 0
    assert(out(2L) === ((4L, 4L, 0.0)))
  }
}
