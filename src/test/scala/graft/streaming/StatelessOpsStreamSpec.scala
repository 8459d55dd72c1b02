package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.functions.{TextFunctions => TF}
import graft.operators.{QualityFilters, Sampling}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The per-row (stateless) corpus operators must work UNCHANGED on a
  * stream — that is the point of keeping them pure Column transforms.
  * This spec drives quality filtering (including the PushdownBarrier
  * expression, which declares itself non-deterministic — a property the
  * streaming analyzer could reject if it were mis-classified), PII
  * masking, language ID, and deterministic sampling through a
  * MemoryStream and checks batch-identical results.
  */
// top-level: encoder codegen cannot reach a class nested in the suite
case class SDoc(doc_id: Long, text: String, ts: Timestamp)

class StatelessOpsStreamSpec extends SparkSpec {

  private def ts0 = Timestamp.valueOf("2026-01-01 10:00:00")

  test("quality keep + maskPii + langId + sample run on a stream, " +
      "batch-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val docs = Seq(
      SDoc(1L, "the quick brown fox jumps over the lazy dog and then " +
        "keeps running through the field with plenty distinct words " +
        "to pass the minimum threshold set here today", ts0),
      SDoc(2L, "too short", ts0),
      SDoc(3L, "mail me at someone@example.com with account 123456789012 " +
        "and the rest of this sentence is long enough to stay above the " +
        "minimum token threshold for keeping documents in place", ts0))
    val t = QualityFilters.Thresholds(minTokens = 20)

    def pipeline(df: org.apache.spark.sql.DataFrame) =
      Sampling.sample(
        QualityFilters.keep(df, "text", t)
          .withColumn("masked", TF.maskPii(col("text")))
          .withColumn("lang_pred", TF.langId(col("text"))),
        "doc_id", fraction = 1.0)
        .select(col("doc_id"), col("masked"), col("lang_pred"))

    val mem = MemoryStream[SDoc]
    val q = pipeline(mem.toDF())
      .writeStream.format("memory").queryName("stateless_ops")
      .outputMode(OutputMode.Append()).start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.sql("SELECT * FROM stateless_ops").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val batch = pipeline(docs.toDF()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(streamed.nonEmpty, "stream produced nothing")
    assert(streamed.toSeq === batch.toSeq,
      "stream and batch must agree row-for-row")
    assert(!streamed.map(_._1).contains(2L), "quality filter must drop " +
      "the short doc on the stream too")
    assert(streamed.find(_._1 == 3L).exists(r =>
      r._2.contains("[EMAIL]") && r._2.contains("[NUM]")))
  }

  test("BPE encode runs on a stream with a frozen merge list, " +
      "batch-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // a tokenizer is trained OFFLINE (batch) and applied to arriving
    // documents — encode is one pure UDF projection, so the stream form
    // is the batch form unchanged
    val train = Seq(
      (1L, "a b a b a b"),
      (2L, "a b c")
    ).toDF("doc_id", "text")
    val merges = graft.operators.TokenizerTraining.trainMerges(
      train, "doc_id", "text", rounds = 4, minCount = 2)
    val arrivals = Seq(
      SDoc(10L, "a b x a b a b c", ts0),
      SDoc(11L, "b a b a", ts0))

    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TokenizerTraining
        .encode(df, "doc_id", "text", merges)
        .select(col("doc_id"),
          concat_ws("|", col("encoded")).as("enc"))

    val mem = MemoryStream[SDoc]
    val q = pipeline(mem.toDF())
      .writeStream.format("memory").queryName("bpe_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = s.sql("SELECT * FROM bpe_stream").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    val batch = pipeline(arrivals.toDF()).collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.find(_._1 == 10L).exists(_._2 === "a b|x|a b a b|c"))
  }

  test("coreset assignToCenters is map-only vs the center literal and " +
      "runs on a stream batch-identically") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0))
    val rows = Seq(
      (1L, Seq(0f, 0f), ts0), (2L, Seq(3f, 4f), ts0),
      (3L, Seq(10f, 0f), ts0), (4L, Seq(7f, 0f), ts0))
    val mem = MemoryStream[(Long, Seq[Float], Timestamp)]
    val q = graft.operators.Coreset.assignToCenters(
        mem.toDF().toDF("vec_id", "embedding", "ts"),
        "embedding", centers)
      .select(col("vec_id"), col("cover_dist_sq"))
      .writeStream.format("memory").queryName("coreset_cov")
      .outputMode(OutputMode.Append()).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("SELECT * FROM coreset_cov").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val batch = graft.operators.Coreset.assignToCenters(
        rows.toDF("vec_id", "embedding", "ts"), "embedding", centers)
      .select(col("vec_id"), col("cover_dist_sq")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.toMap === Map(1L -> 0.0, 2L -> 25.0, 3L -> 0.0,
      4L -> 9.0))
  }

  test("URL canonicalization and the JL projection are pure Column " +
      "programs — stream ≡ batch bit-for-bit") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val vecs = (0L until 6L).map(i => SVec(i,
      Array.tabulate(8)(d => math.sin(i * 1.7 + d).toFloat), ts0))

    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.operators.RandomProjection.projectSigned(
        df.withColumn("url", concat(lit("HTTPS://WWW.h"),
            col("vec_id") % 3, lit(".ex.org:443/p/"), col("vec_id"),
            lit("/?utm_x=1&b=2&a=1")))
          .withColumn("canonical",
            graft.functions.Urls.canonicalize(col("url"))),
        "embedding", dIn = 8, dOut = 4)
        .select(col("vec_id"), col("canonical"), col("proj"))

    val mem = MemoryStream[SVec]
    val q = pipeline(mem.toDF())
      .writeStream.format("memory").queryName("url_jl_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(vecs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("SELECT * FROM url_jl_stream").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getSeq[Double](2).map(java.lang.Double.doubleToLongBits)))
      .sortBy(_._1)
    val batch = pipeline(vecs.toDF()).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getSeq[Double](2).map(java.lang.Double.doubleToLongBits)))
      .sortBy(_._1)
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.forall(_._2.startsWith("https://h")))
  }

  test("imageQualityStats runs on a stream (one stateless decode " +
      "pass), batch-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val vecs = (0L until 4L).map(i => SVec(i,
      Array.tabulate(8)(d => math.cos(i * 0.9 + d * 0.4).toFloat), ts0))

    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Multimodal.imageQualityStats(
        graft.operators.Multimodal.asMedia(
          graft.operators.Multimodal.encodePng(
            df.withColumn("pixels", expr("transform(embedding, " +
              "v -> floor((CAST(v AS DOUBLE) + 1.0) * 127.5))")),
            "vec_id", "pixels", side = 8), "media_id", "media"))

    val mem = MemoryStream[SVec]
    val q = pipeline(mem.toDF())
      .writeStream.format("memory").queryName("img_quality_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(vecs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("SELECT * FROM img_quality_stream").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    val batch = pipeline(vecs.toDF()).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.nonEmpty)
  }
}

// top-level: encoder codegen cannot reach a class nested in the suite
case class SVec(vec_id: Long, embedding: Array[Float], ts: Timestamp)

class UrlDedupStreamSpec extends SparkSpec {

  test("UrlDedup.flagAgainstIndex is a stream-static join — the " +
      "crawl-batch probe runs on a stream, batch-identical") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val corpus = Seq((1L, "https://a.com/x"), (2L, "https://b.com/y"))
      .toDF("doc_id", "url")
    val index = graft.operators.UrlDedup.urlIndex(corpus, "doc_id",
      "url")
    val delta = Seq(
      SDoc(10L, "HTTPS://WWW.a.com:443/x?utm_k=1",
        Timestamp.valueOf("2026-01-01 10:00:00")),
      SDoc(11L, "https://c.com/new",
        Timestamp.valueOf("2026-01-01 10:00:01")))

    def pipeline(df: org.apache.spark.sql.DataFrame) =
      graft.operators.UrlDedup.flagAgainstIndex(
        df.withColumnRenamed("text", "url"), index, "doc_id", "url")

    val mem = MemoryStream[SDoc]
    val q = pipeline(mem.toDF())
      .writeStream.format("memory").queryName("url_dedup_stream")
      .outputMode(OutputMode.Append()).start()
    mem.addData(delta: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = s.sql("SELECT * FROM url_dedup_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
    val batch = pipeline(delta.toDF()).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.length === 2)
    assert(streamed.find(_._1 == 10L).exists(_._3 === true))
    assert(streamed.find(_._1 == 11L).exists(_._3 === false))
  }
}
