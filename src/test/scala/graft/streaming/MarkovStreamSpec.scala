package graft.streaming

import graft.ingest.SparkSpec
import graft.operators.Markov
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class MarkovStreamSpec extends SparkSpec {

  import MarkovStream.{Ev, Transition}

  test("streamed transition counts across batch boundaries == batch " +
      "transitionMatrix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    var seed = 11L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed
    }
    val states = Array("view", "click", "purchase", "error")
    val tape = (0 until 200).map { i =>
      Ev((next() >>> 20) % 5L, i.toLong, i.toLong,
        states(((next() >>> 33) % 4L).toInt))
    }

    val mem = MemoryStream[Ev]
    val q = MarkovStream.transitions(mem.toDS())
      .writeStream.format("memory").queryName("markov_tr")
      .outputMode(OutputMode.Append()).start()
    // deliberately split mid-key so transitions straddle batches
    tape.grouped(37).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("SELECT * FROM markov_tr").as[Transition]
      .groupBy(col("from_state"), col("to_state"))
      .count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    val batch = Markov.transitionMatrix(
        tape.toDF("user_id", "t", "tie", "state"),
        "user_id", "t", "tie", "state")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
