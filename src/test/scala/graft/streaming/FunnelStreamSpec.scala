package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.operators.Funnel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streamed anchored funnel ≡ the batch operator: the same event-time-
  * ordered events, chopped into micro-batches, must land every user on
  * the same chain state as one batch pass — and as the DataFrame
  * operator's chained-min times.
  */
class FunnelStreamSpec extends SparkSpec {

  import FunnelStream.{FEvent, FOut}

  private val steps = Seq("view", "click", "purchase")
  private val hourMs = 3600 * 1000L

  /** Deterministic pseudo-random event tape, ordered by ts. */
  private def tape: Seq[FEvent] = {
    var seed = 12345L
    def next(): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; seed }
    val types = Seq("view", "click", "purchase", "error")
    (0 until 600).map { i =>
      // high bits — an LCG's low bits are short-period
      val u = ((next() >>> 13) % 25L)
      val ty = types(((next() >>> 33) % types.length).toInt)
      FEvent(u, ty, new Timestamp(1700000000000L + i * 15000L))
    }
  }

  private def finalStates(rows: Seq[FOut]): Map[Long, (Int, Seq[Long])] =
    // state is monotone: the row with the highest reached count per
    // user is the final one
    rows.groupBy(_.user_id).map { case (u, rs) =>
      u -> { val best = rs.maxBy(_.reached); (best.reached, best.times) }
    }

  test("stream in 4 ordered chunks == single batch == Funnel operator") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val events = tape
    // single-pass batch run of the same fold
    val batch = FunnelStream.funnelUpdates(events.toDS(), steps, hourMs)
      .collect().toSeq
    // streamed in 4 event-time-ordered chunks
    val mem = MemoryStream[FEvent]
    val q = FunnelStream.funnelUpdates(mem.toDS(), steps, hourMs)
      .writeStream.format("memory").queryName("funnel_updates")
      .outputMode(OutputMode.Update()).start()
    events.grouped(150).foreach { chunk =>
      mem.addData(chunk: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("SELECT * FROM funnel_updates").as[FOut]
      .collect().toSeq

    val fb = finalStates(batch)
    val fs = finalStates(streamed)
    assert(fs === fb, "stream must equal the one-shot batch fold")

    // and both equal the declarative batch operator's chained mins
    val opTimes = Funnel.funnelTimes(
        events.toDF(), "user_id", "event_type", "ts", steps, "1 hour")
      .collect().map { r =>
        val times = steps.indices.map { i =>
          if (r.isNullAt(r.fieldIndex(s"t${i + 1}"))) -1L
          else r.getAs[Timestamp](s"t${i + 1}").getTime
        }
        r.getAs[Long]("user_id") -> times
      }.toMap
    fb.foreach { case (u, (_, times)) =>
      opTimes.get(u) match {
        case Some(expect) => assert(times === expect, s"user $u")
        case None => assert(times.forall(_ == -1L),
          s"user $u reached steps without a step-1 anchor")
      }
    }
    // the fixture must actually exercise deep conversions
    assert(fb.values.exists(_._1 == 3), "no user completed the funnel")
    assert(fb.values.exists(_._1 < 3), "every user completed the funnel")
  }

  test("a step arriving before its predecessor does not count") {
    val s = spark
    import s.implicits._
    val t0 = 1700000000000L
    val ds = Seq(
      FEvent(1, "click", new Timestamp(t0)),
      FEvent(1, "view", new Timestamp(t0 + 1000))).toDS()
    val out = FunnelStream.funnelUpdates(ds, steps, hourMs).collect()
    assert(out.head.reached === 1)
  }
}
