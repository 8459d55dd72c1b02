package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.operators.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streamed sessionization ≡ the batch fold ≡ the declarative
  * operator, including sessions that straddle micro-batch boundaries.
  */
class SessionStreamSpec extends SparkSpec {

  import SessionStream.{SEvent, SOut}

  /** Event tape on the 0.25 value grid (sums exact in any order),
    * event-time ordered; gaps engineered so sessions straddle the
    * chunk boundaries below.
    */
  private def tape: Seq[SEvent] = {
    var seed = 777L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed
    }
    (0 until 400).map { i =>
      val u = ((next() >>> 13) % 12L)
      // bursts: mostly 1-minute steps with occasional 3-hour jumps
      val step = if ((next() >>> 33) % 7L == 0L) 10800000L else 60000L
      SEvent(u, i.toLong,
        new Timestamp(1700000000000L + i * step / 4 + i * 30000L),
        ((next() >>> 40) % 8L) * 0.25)
    }.sortBy(e => (e.ts.getTime, e.event_id))
  }

  /** Latest row per session: most events, closed beats open on a tie
    * (a session open at one batch's end closes in a later batch with
    * the same counts — the closed row is the definitive one).
    */
  private def finals(rows: Seq[SOut]): Map[(Long, Long), SOut] =
    rows.groupBy(r => (r.user_id, r.session_idx))
      .map { case (k, rs) =>
        k -> rs.maxBy(r => (r.n_events, if (r.is_open) 0 else 1))
      }

  test("stream in 5 chunks == one-shot batch fold == Sessionize " +
      "operator stats") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val events = tape
    val batch = SessionStream.sessionUpdates(events.toDS(), 30)
      .collect().toSeq
    val mem = MemoryStream[SEvent]
    val q = SessionStream.sessionUpdates(mem.toDS(), 30)
      .writeStream.format("memory").queryName("session_updates")
      .outputMode(OutputMode.Update()).start()
    events.grouped(80).foreach { chunk =>
      mem.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("SELECT * FROM session_updates").as[SOut]
      .collect().toSeq
    val fb = finals(batch)
    val fs = finals(streamed)
    assert(fs === fb, "stream must equal the one-shot fold")

    // and both equal the declarative batch operator
    val op = Sessionize.sessionStats(events.toDF(), "user_id", "ts",
        "event_id", "user_id", "value", gapMinutes = 30)
      .collect().map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
          ((r.getAs[Long]("start_us"), r.getAs[Long]("end_us"),
            r.getAs[Long]("n_events"),
            r.getAs[Double]("session_value")))
      }.toMap
    assert(op.keySet === fb.keySet)
    fb.foreach { case (k, o) =>
      val (s0, s1, ne, sv) = op(k)
      assert((o.start_us, o.end_us, o.n_events) === ((s0, s1, ne)), k)
      assert(o.session_value === sv, k) // 0.25 grid: exact either way
    }
    // closed sessions are emitted exactly once as closed
    val closedCounts = streamed.filter(!_.is_open)
      .groupBy(r => (r.user_id, r.session_idx)).view.mapValues(_.size)
    assert(closedCounts.values.forall(_ === 1))
  }
}
