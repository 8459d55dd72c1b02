package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.operators.Scd
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streamed SCD2 ≡ batch: the closed intervals emitted across chunked
  * micro-batches must equal the batch operator's closed rows on the
  * same event-time-ordered tape.
  */
class ScdStreamSpec extends SparkSpec {

  import ScdStream.{ClosedInterval, Obs}

  private def tape: Seq[Obs] = {
    var seed = 99L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val states = Seq("a", "b", "c")
    (0 until 300).map { i =>
      val k = (next() >>> 17) % 12L
      val s = states(((next() >>> 33) % 3L).toInt)
      Obs(k, s, new Timestamp(1700000000000L + i * 60000L), i.toLong)
    }
  }

  test("closed intervals across 3 chunks == batch closed rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[Obs]
    val q = ScdStream.closedIntervals(mem.toDS())
      .writeStream.format("memory").queryName("scd_closed")
      .outputMode(OutputMode.Append()).start()
    tape.grouped(100).foreach { chunk =>
      mem.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("SELECT * FROM scd_closed").as[ClosedInterval]
      .collect().map(c => (c.key, c.state, c.effective_from.getTime,
        c.effective_to.getTime, c.n_obs)).sorted.toSeq

    val batch = Scd.intervalize(
        tape.toDF("key", "state", "ts", "seq")
          .withColumnRenamed("key", "user_key"),
        "user_key", "state", "ts", "seq")
      .filter(col("effective_to").isNotNull)
      .collect().map(r => (r.getAs[Long]("user_key"),
        r.getAs[String]("state"),
        r.getAs[Timestamp]("effective_from").getTime,
        r.getAs[Timestamp]("effective_to").getTime,
        r.getAs[Long]("n_obs"))).sorted.toSeq

    assert(streamed === batch)
    assert(streamed.nonEmpty, "fixture must close some intervals")
  }

  test("run continuing across a batch boundary is not split") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[Obs]
    val q = ScdStream.closedIntervals(mem.toDS())
      .writeStream.format("memory").queryName("scd_boundary")
      .outputMode(OutputMode.Append()).start()
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    mem.addData(Obs(1L, "x", ts(0), 0), Obs(1L, "x", ts(1), 1))
    q.processAllAvailable()
    mem.addData(Obs(1L, "x", ts(2), 2), Obs(1L, "y", ts(3), 3))
    q.processAllAvailable()
    q.stop()
    val rows = s.sql("SELECT * FROM scd_boundary").as[ClosedInterval]
      .collect()
    // one closed interval: x over [t0, t3) with THREE observations —
    // the boundary did not split the run
    assert(rows.length === 1)
    assert(rows(0).state === "x" && rows(0).n_obs === 3L)
    assert(rows(0).effective_from === ts(0) && rows(0).effective_to === ts(3))
  }
}
