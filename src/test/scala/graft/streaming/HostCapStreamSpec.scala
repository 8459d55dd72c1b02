package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.operators.UrlDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming host-cap admission vs the batch cap: one batch must admit
  * EXACTLY the batch cap's keep set; across batches admission is
  * prefix-greedy (early admits never retract, late winners still
  * admit, late losers refuse) — a documented SUPERSET of the batch
  * keep set.
  */
class HostCapStreamSpec extends SparkSpec {

  import HostCapStream.{HDoc, HOut}

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  /** Deterministic tape: 40 docs over 3 hosts, LCG scores. */
  private def tape: Seq[HDoc] = {
    var seed = 99L
    def next(): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L; seed
    }
    (0 until 40).map { i =>
      HDoc(i.toLong, s"h${(next() >>> 33) % 3}",
        (next() >>> 40) % 50L, ts(i))
    }
  }

  test("single batch admissions == capPerHost keep set, counts and " +
      "ties included") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = tape
    val mem = MemoryStream[HDoc]
    val q = HostCapStream.admissions(mem.toDS(), maxPerHost = 5)
      .writeStream.format("memory").queryName("hostcap_one")
      .outputMode(OutputMode.Update()).start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val admitted = s.sql("SELECT * FROM hostcap_one").as[HOut]
      .collect().filter(_.admitted).map(_.doc_id).toSet
    val batchKept = UrlDedup.capPerHost(
        docs.toDF(), "doc_id", "host", "score", 5)
      .filter(col("is_kept")).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(admitted === batchKept)
  }

  test("across batches: early admits never retract, a late winner " +
      "still admits, a late loser refuses — the superset law") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // one host, cap 2: batch 1 = scores 10, 20 (both admit — budget
    // empty); batch 2 = 90 (beats 0 admitted ≥ cap → admits: stream
    // now holds 3 > cap) and 15 (beaten by 90 and 20 → refuses)
    val b1 = Seq(HDoc(1L, "h", 10L, ts(0)), HDoc(2L, "h", 20L, ts(1)))
    val b2 = Seq(HDoc(3L, "h", 90L, ts(2)), HDoc(4L, "h", 15L, ts(3)))
    val mem = MemoryStream[HDoc]
    val q = HostCapStream.admissions(mem.toDS(), maxPerHost = 2)
      .writeStream.format("memory").queryName("hostcap_two")
      .outputMode(OutputMode.Update()).start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val out = s.sql("SELECT * FROM hostcap_two").as[HOut].collect()
      .map(r => r.doc_id -> ((r.admitted, r.n_admitted_host))).toMap
    assert(out === Map(
      1L -> ((true, 2L)), // within-batch fold is (score desc): 20 first
      2L -> ((true, 1L)),
      3L -> ((true, 3L)), // late winner admits past the cap
      4L -> ((false, 3L)))) // beaten by cap-many admitted pages
    // the stream's admitted set is a SUPERSET of the batch cap's keep
    val batchKept = UrlDedup.capPerHost(
        (b1 ++ b2).toDF(), "doc_id", "host", "score", 2)
      .filter(col("is_kept")).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val admitted = out.filter(_._2._1).keySet
    assert(batchKept.subsetOf(admitted))
    assert(admitted === Set(1L, 2L, 3L))
  }
}
