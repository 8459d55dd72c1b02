package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.operators.CrossLingual
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream ≡ batch for the cross-lingual fingerprint dedup: the
  * chunked stream's HIT set must equal the batch
  * [[CrossLingual.flagIncremental]] rows with is_dup = true, field
  * for field.
  */
class CrossLingualStreamSpec extends SparkSpec {

  test("chunked stream hits == batch flagIncremental's dup rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val corpus = Seq(
      (1L, "solar energy policy framework", "en"),
      (2L, "framework POLICY énergy solar!", "fr"),
      (3L, "wind turbine siting rules", "de"),
      (4L, "completely unrelated corpus text", "es"))
      .toDF("doc_id", "text", "lang")
    // delta: 10 matches cluster {1,2} cross-lingually; 11 matches it
    // same-language; 12 matches the de doc; 13/14 are clean
    val deltaRows = Seq(
      CrossLingualStream.LangDoc(10L, "energy solar framework policy",
        "zh", new Timestamp(1000L)),
      CrossLingualStream.LangDoc(11L, "policy framework solar energy",
        "en", new Timestamp(2000L)),
      CrossLingualStream.LangDoc(12L, "rules siting turbine wind",
        "fr", new Timestamp(3000L)),
      CrossLingualStream.LangDoc(13L, "fresh new delta content", "en",
        new Timestamp(4000L)),
      CrossLingualStream.LangDoc(14L, "another clean document", "fr",
        new Timestamp(5000L)))

    val corpusFp = CrossLingual.fingerprintIndex(corpus, "doc_id",
      "text", "lang")
    val mem = MemoryStream[CrossLingualStream.LangDoc]
    val q = CrossLingualStream.collisions(mem.toDF(), corpusFp)
      .writeStream.format("memory").queryName("xling_hits")
      .outputMode(OutputMode.Append()).start()
    deltaRows.grouped(2).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("SELECT * FROM xling_hits").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_id"),
        r.getAs[String]("matched_langs"),
        r.getAs[Boolean]("is_cross_lingual"))).toSet

    val batch = CrossLingual.flagIncremental(
        deltaRows.map(d => (d.doc_id, d.text, d.lang))
          .toDF("doc_id", "text", "lang"),
        corpus, "doc_id", "text", "lang")
      .filter(col("is_dup"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_id"),
        r.getAs[String]("matched_langs"),
        r.getAs[Boolean]("is_cross_lingual"))).toSet

    assert(streamed === batch)
    assert(streamed.map(_._1) === Set(10L, 11L, 12L))
    assert(streamed.find(_._1 == 10L).get._4 === true)  // zh not in en,fr
    assert(streamed.find(_._1 == 11L).get._4 === false) // en IS in cluster
    assert(streamed.find(_._1 == 12L).get._4 === true)  // fr not in de
  }
}
