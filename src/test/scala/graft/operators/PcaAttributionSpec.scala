package graft.operators

import graft.ingest.SparkSpec
import org.apache.spark.sql.functions._

class PcaAttributionSpec extends SparkSpec {

  test("covarianceMatrix: hand-computed cells, symmetric, d² rows") {
    val s = spark
    import s.implicits._
    // two 2-d points: (0,0), (2,2) → means (1,1); pop cov = [[1,1],[1,1]]
    val df = Seq(Array(0.0f, 0.0f), Array(2.0f, 2.0f)).toDF("v")
    val cov = Pca.covarianceMatrix(df, "v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(cov.size === 4)
    assert(cov.values.forall(_ === 1.0))
    // anti-correlated: (0,2), (2,0) → cov = [[1,-1],[-1,1]]
    val df2 = Seq(Array(0.0f, 2.0f), Array(2.0f, 0.0f)).toDF("v")
    val cov2 = Pca.covarianceMatrix(df2, "v")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(cov2((1, 1)) === 1.0 && cov2((2, 2)) === 1.0)
    assert(cov2((1, 2)) === -1.0 && cov2((2, 1)) === -1.0)
  }

  test("topComponent: recovers the dominant axis of a stretched cloud " +
      "with the sign convention") {
    val s = spark
    import s.implicits._
    // spread along (1,1)/√2 with tiny noise on the anti-diagonal
    val pts = (0 until 40).map { k =>
      val t = (k - 20).toDouble
      val eps = if (k % 2 == 0) 0.01 else -0.01
      Array((t + eps).toFloat, (t - eps).toFloat)
    }.toDF("v")
    val comp = Pca.topComponent(Pca.covarianceMatrix(pts, "v"), iters = 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(comp(1) - inv) < 1e-3, comp)
    assert(math.abs(comp(2) - inv) < 1e-3, comp)
    // unit norm on the grid
    val n2 = comp.values.map(x => x * x).sum
    assert(math.abs(n2 - 1.0) < 1e-4)
  }

  test("topComponent on the real embeddings: unit vector, eigenvalue " +
      "positive, deterministic") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cov = Pca.covarianceMatrix(emb, "embedding")
    assert(cov.count() === 64L * 64L)
    val c1 = Pca.topComponent(cov, 6).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).toSeq
    val c2 = Pca.topComponent(Pca.covarianceMatrix(
        emb.repartition(9), "embedding"), 6).collect()
      .map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(c1 === c2)
    val n2 = c1.map(x => x._2 * x._2).sum
    assert(math.abs(n2 - 1.0) < 1e-3)
  }

  test("deflation: second component is the anti-diagonal of the " +
      "stretched cloud, orthogonal to the first") {
    val s = spark
    import s.implicits._
    val pts = (0 until 40).map { k =>
      val t = (k - 20).toDouble
      val eps = if (k % 2 == 0) 0.5 else -0.5
      Array((t + eps).toFloat, (t - eps).toFloat)
    }.toDF("v")
    val cov = Pca.covarianceMatrix(pts, "v")
    val c1 = Pca.topComponent(cov, 8)
    val c2 = Pca.topComponent(Pca.deflate(cov, c1), 8)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val inv = 1.0 / math.sqrt(2.0)
    // second component = (1,-1)/√2 up to the sign convention
    assert(math.abs(math.abs(c2(1)) - inv) < 5e-3, c2)
    assert(math.abs(math.abs(c2(2)) - inv) < 5e-3, c2)
    assert(c2(1) * c2(2) < 0, c2)
    val c1m = c1.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val dot = c1m(1) * c2(1) + c1m(2) * c2(2)
    assert(math.abs(dot) < 5e-3, s"not orthogonal: $dot")
  }

  test("positionBased attribution: hand-computed credits") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: 3 touches then purchase → 0.4 / 0.2 / 0.4
      (1L, 10L, "view", false, true), (1L, 20L, "click", false, true),
      (1L, 30L, "view", false, true), (1L, 40L, "purchase", true, false),
      // user 2: 1 touch → 1.0
      (2L, 10L, "click", false, true), (2L, 15L, "purchase", true, false),
      // user 3: 2 touches → 0.5 each
      (3L, 1L, "view", false, true), (3L, 2L, "click", false, true),
      (3L, 3L, "purchase", true, false),
      // user 4: touch OUTSIDE the window contributes nothing
      (4L, 1L, "view", false, true), (4L, 5000L, "purchase", true, false)
    ).toDF("user_id", "us", "channel", "isc", "ist")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val out = Attribution.positionBased(ev, "user_id", "ts", "us",
        "channel", col("isc"), col("ist"), windowMicros = 1000L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // view: u1 first 0.4 + u1 middle... order u1: view(10) click(20)
    // view(30) → view 0.4 + 0.4, click 0.2 ; u2 click 1.0 ; u3 view 0.5
    // click 0.5
    assert(out("view") === ((3L, 1.3)))
    assert(out("click") === ((3L, 1.7)))
  }

  test("shapleyAttribution: hand-computed coalition values, " +
      "unobserved sets contribute zero, efficiency on the fixture") {
    val s = spark
    import s.implicits._
    // v(a)=0.5, v(b)=0, v(a,b)=1, v(empty) unobserved -> 0
    // phi_a = 1/2*(0.5-0) + 1/2*(1-0) = 0.75; phi_b = 0.25
    val ev = Seq(
      (1L, "a"), (1L, "buy"),
      (2L, "a"),
      (3L, "b"),
      (4L, "a"), (4L, "b"), (4L, "buy")
    ).toDF("user_id", "event_type")
    val out = Attribution.shapleyAttribution(ev, "user_id",
        "event_type", convType = "buy")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Double]("shapley")))).toMap
    assert(out === Map("a" -> ((2L, 0.75)), "b" -> ((2L, 0.25))))
    // efficiency: with every subset observed, credits sum to
    // v(full) - v(empty)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("shapleyAttribution at 13 channels: Double-fold factorials " +
      "(Int 13! wraps) keep the weights exact — one converting user " +
      "touching all 13 gives phi = 1/13 each, efficiency holds") {
    val s = spark
    import s.implicits._
    val chs = ('a' to 'm').map(_.toString)
    val ev = (chs.map(c => (1L, c)) :+ ((1L, "buy")))
      .toDF("user_id", "event_type")
    val out = Attribution.shapleyAttribution(ev, "user_id",
        "event_type", convType = "buy")
      .collect().map(r => r.getString(0) ->
        r.getAs[Double]("shapley")).toMap
    assert(out.size === 13)
    // only S = C\{c} contributes: w = 12!*0!/13! = 1/13, snapped
    val want = graft.functions.Grid.snapD(1.0 / 13.0)
    out.foreach { case (c, phi) =>
      assert(phi === want, s"channel $c")
    }
    assert(math.abs(out.values.sum - 1.0) < 1e-4)
  }

  test("shapleyAttribution fails fast on a 17-channel alphabet — " +
      "before any driver-side v-table collect") {
    val s = spark
    import s.implicits._
    val ev = (0 until 17).map(i => (i.toLong, s"ch$i"))
      .toDF("user_id", "event_type")
    val e = intercept[IllegalArgumentException] {
      Attribution.shapleyAttribution(ev, "user_id", "event_type",
        convType = "buy")
    }
    assert(e.getMessage.contains("17"))
  }
}
