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
}
