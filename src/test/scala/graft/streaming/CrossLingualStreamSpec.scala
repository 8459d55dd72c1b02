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

  test("collisionsScripted: a zh arrival collides with its corpus " +
      "permutation (stream ≡ batch flagIncrementalScripted), where " +
      "the Latin-fold stream sees nothing") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val corpus = Seq(
      (1L, "气候政策框架", "zh"),
      (2L, "рамки климатической политики", "ru"),
      (3L, "solar energy policy", "en")).toDF("doc_id", "text", "lang")
    val deltaRows = Seq(
      CrossLingualStream.LangDoc(10L, "框架。政策，气候",
        "zh-tw", new Timestamp(1000L)),      // permuted zh -> hit
      CrossLingualStream.LangDoc(11L, "совсем другой текст", "ru",
        new Timestamp(2000L)),               // fresh -> no hit
      CrossLingualStream.LangDoc(12L, "policy solar ENERGY!", "fr",
        new Timestamp(3000L)))               // latin dup still hits
    val fpIdx = CrossLingual.fingerprintIndexScripted(corpus,
      "doc_id", "text", "lang")
    val mem = MemoryStream[CrossLingualStream.LangDoc]
    val q = CrossLingualStream.collisionsScripted(mem.toDF(), fpIdx)
      .writeStream.format("memory").queryName("xling_script_hits")
      .outputMode(OutputMode.Append()).start()
    deltaRows.foreach { d => mem.addData(d); q.processAllAvailable() }
    q.stop()
    val streamed = s.sql("SELECT * FROM xling_script_hits").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_id"),
        r.getAs[Boolean]("is_cross_lingual"))).toSet

    val batch = CrossLingual.flagIncrementalScripted(
        deltaRows.map(d => (d.doc_id, d.text, d.lang))
          .toDF("doc_id", "text", "lang"),
        corpus, "doc_id", "text", "lang")
      .filter(col("is_dup")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("matched_id"),
        r.getAs[Boolean]("is_cross_lingual"))).toSet

    assert(streamed === batch)
    assert(streamed.map(_._1) === Set(10L, 12L))
    // the Latin-fold stream on the same arrivals misses the zh hit
    val mem2 = MemoryStream[CrossLingualStream.LangDoc]
    val corpusFp = CrossLingual.fingerprintIndex(corpus, "doc_id",
      "text", "lang")
    val q2 = CrossLingualStream.collisions(mem2.toDF(), corpusFp)
      .writeStream.format("memory").queryName("xling_latin_hits")
      .outputMode(OutputMode.Append()).start()
    deltaRows.foreach { d => mem2.addData(d); q2.processAllAvailable() }
    q2.stop()
    val latin = s.sql("SELECT doc_id FROM xling_latin_hits").collect()
      .map(_.getLong(0)).toSet
    assert(latin === Set(12L))
  }
}
