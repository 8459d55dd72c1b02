package graft.streaming

import graft.ingest.SparkSpec
import graft.operators.Robust
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class CusumStreamSpec extends SparkSpec {

  import CusumStream.{CusumOut, Point}

  test("chunked stream == batch cusumDrift == literal recurrence") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    var seed = 7L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val tape = (0 until 240).map { i =>
      val key = s"k${(next() >>> 20) % 3L}"
      val burst = if (i > 180) 6.0 else 0.0
      Point(key, i.toLong, ((next() >>> 33) % 5L).toDouble + burst)
    }
    // the batch operator's self-calibrated allowance, reproduced
    val xs = tape.map(_.x)
    val mu = xs.sum / xs.length
    val sd = math.sqrt(xs.map(x => x * x).sum / xs.length - mu * mu)
    val k = mu + 0.5 * sd
    val h = 2.0 * sd

    val mem = MemoryStream[Point]
    val q = CusumStream.updates(mem.toDS(), k, h)
      .writeStream.format("memory").queryName("cusum_updates")
      .outputMode(OutputMode.Append()).start()
    tape.grouped(80).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    q.stop()
    val streamed = s.sql("SELECT * FROM cusum_updates").as[CusumOut]
      .collect().map(o => (o.key, o.t) -> (o.cusum, o.drift)).toMap

    val batch = Robust.cusumDrift(tape.toDF("key", "t", "x"),
        "key", "t", "x", slack = 0.5, threshold = 2.0)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("t")) ->
        (r.getAs[Double]("cusum"), r.getAs[Boolean]("drift"))).toMap

    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (kt, (c, d)) =>
      assert(math.abs(c - batch(kt)._1) < 1e-4, s"$kt")
      assert(d === batch(kt)._2, s"drift flag at $kt")
    }
    // the injected tail burst must trip the monitor on every key
    val tail = streamed.filter(_._1._2 > 220)
    assert(tail.nonEmpty && tail.values.exists(_._2),
      "the burst should trip drift")
  }

  test("ewma: chunked stream == the literal recurrence, seeded at x_1") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val xs = Seq(4.0, 2.0, 8.0, 8.0, 1.0, 3.0, 9.0, 0.0)
    val tape = xs.zipWithIndex.map { case (x, i) => Point("a", i.toLong, x) }
    val mem = MemoryStream[Point]
    val q = CusumStream.ewma(mem.toDS(), alpha = 0.3)
      .writeStream.format("memory").queryName("ewma_updates")
      .outputMode(OutputMode.Append()).start()
    tape.grouped(3).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    q.stop()
    val got = s.sql("SELECT * FROM ewma_updates")
      .as[CusumStream.EwmaOut].collect()
      .sortBy(_.t).map(_.ewma).toSeq
    var e = xs.head
    val expect = xs.head +: xs.tail.map { x => e = 0.3 * x + 0.7 * e; e }
    got.zip(expect).foreach { case (g, x) =>
      assert(math.abs(g - x) < 1e-12)
    }
  }

  test("page-hinkley: chunked stream's final per-key row == the batch " +
      "operator bit-for-bit (same fold, same 1e-6 snap)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    var seed = 11L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val tape = (0 until 200).map { i =>
      val key = s"k${(next() >>> 20) % 3L}"
      val shift = if (i > 140) 8.0 else 0.0
      CusumStream.Point(key, i.toLong, ((next() >>> 33) % 6L).toDouble + shift)
    }

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[CusumStream.Point]
    val q = CusumStream.pageHinkley(mem.toDS(), delta = 0.5,
        lambda = 10.0)
      .writeStream.format("memory").queryName("ph_updates")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    tape.grouped(60).foreach { c => mem.addData(c: _*); q.processAllAvailable() }
    q.stop()
    val streamedFinal = s.sql("SELECT * FROM ph_updates")
      .as[CusumStream.PhOut].collect()
      .groupBy(_.key).map { case (k, rows) => k -> rows.maxBy(_.t) }

    val batch = graft.operators.Robust.pageHinkley(
        tape.toDF("key", "t", "x"), "key", "t", "x",
        delta = 0.5, lambda = 10.0)
      .collect().map(r => r.getAs[String]("key") -> r).toMap

    assert(streamedFinal.keySet === batch.keySet)
    streamedFinal.foreach { case (k, o) =>
      val b = batch(k)
      assert(o.n === b.getAs[Long]("n"), s"n at $k")
      assert(o.mean === b.getAs[Double]("mean"), s"mean at $k")
      assert(o.ph === b.getAs[Double]("ph"), s"ph at $k")
      assert(o.drift === b.getAs[Boolean]("drift"), s"drift at $k")
      assert(o.tAlarm === Option(b.getAs[Any]("t_alarm"))
        .map(_.asInstanceOf[Long]), s"t_alarm at $k")
    }
    // the injected level shift must alarm on every key
    assert(streamedFinal.values.forall(_.drift), "shift should alarm")
  }
}
