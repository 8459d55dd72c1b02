package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class JsClick(user_id: Long, click_id: Long, ts: Timestamp)
case class JsConv(user_id: Long, conv_id: Long, ts: Timestamp)

/** Stream-stream interval join ≡ the batch interval join, across
  * micro-batch boundaries and with pairs arriving on either side
  * first.
  */
class JoinStreamSpec extends SparkSpec {

  private def tapes: (Seq[JsClick], Seq[JsConv]) = {
    var seed = 31L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed
    }
    val clicks = (1 to 200).map { i =>
      JsClick(((next() >>> 33) % 20).toLong, i.toLong,
        new Timestamp(1700000000000L + i * 30000L))
    }
    val convs = (1 to 120).map { i =>
      JsConv(((next() >>> 33) % 20).toLong, 1000L + i,
        new Timestamp(1700000000000L + i * 47000L + 11000L))
    }
    (clicks, convs)
  }

  test("streamed interval join in chunks == batch join; both arrival " +
      "orders pair") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val (clicks, convs) = tapes
    val mc = MemoryStream[JsClick]
    val mv = MemoryStream[JsConv]
    val joined = JoinStream.clickAttribution(mc.toDF(), mv.toDF(),
      maxDelaySeconds = 300)
    val q = joined.writeStream.format("memory")
      .queryName("join_stream").outputMode(OutputMode.Append()).start()
    // interleave: clicks slightly ahead, then convs catch up — pairs
    // form whichever side arrived first
    val cChunks = clicks.grouped(50).toSeq
    val vChunks = convs.grouped(30).toSeq
    (0 until math.max(cChunks.size, vChunks.size)).foreach { i =>
      if (i < cChunks.size) mc.addData(cChunks(i): _*)
      q.processAllAvailable()
      if (i < vChunks.size) mv.addData(vChunks(i): _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql(
        "SELECT user_id, click_id, conv_id FROM join_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val batch = clicks.toDF().as("c").join(convs.toDF().as("v"),
        col("c.user_id") === col("v.user_id") &&
          col("v.ts") >= col("c.ts") &&
          col("v.ts") <= col("c.ts") + expr("interval 300 seconds"))
      .select(col("c.user_id"), col("click_id"), col("conv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty, "fixture should produce pairs")
  }
}
