package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.operators.TrainedLangId
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream ≡ batch for the pruned-model langid: the chunked stream's
  * predictions must equal the batch [[TrainedLangId.predictCompact]]
  * rows, and an unpruned compact model must equal the full
  * join-based [[TrainedLangId.predict]].
  */
class LangIdStreamSpec extends SparkSpec {

  test("chunked stream predictions == batch compact predictions; " +
      "an unpruned compact model == the full join-based predict") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val train = (
      (0 until 6).map(i => (i.toLong, "der die das und ist hier", "de")) ++
      (0 until 6).map(i => (100L + i, "the quick brown fox runs", "en")) ++
      (0 until 6).map(i => (200L + i, "le chat noir mange bien", "fr")))
      .toDF("doc_id", "text", "lang")
    val model = TrainedLangId.train(train, "text", "lang")
    // topN far above the vocab -> the compact model carries EVERY
    // gram, so compact scoring must reproduce the full path exactly
    val cm = TrainedLangId.prune(model, topN = 4096)

    val holdRows = Seq(
      LangIdStream.Doc(1L, "die der und das hier", new Timestamp(1000L)),
      LangIdStream.Doc(2L, "quick fox the brown", new Timestamp(2000L)),
      LangIdStream.Doc(3L, "chat le noir bien", new Timestamp(3000L)),
      LangIdStream.Doc(4L, "zzz qqq unseen grams", new Timestamp(4000L)))
    val holdDf = holdRows.map(d => (d.doc_id, d.text, "?"))
      .toDF("doc_id", "text", "lang")

    val full = TrainedLangId.predict(holdDf, "doc_id", "text", model)
      .select(col("doc_id"), col("lang_pred")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val compact = TrainedLangId.predictCompact(holdDf, "text", cm)
      .select(col("doc_id"), col("lang_pred")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(compact === full, "unpruned compact diverged from full")
    assert(compact(1L) === "de" && compact(2L) === "en" &&
      compact(3L) === "fr")

    val mem = MemoryStream[LangIdStream.Doc]
    val q = LangIdStream.predictions(mem.toDF(), cm)
      .writeStream.format("memory").queryName("langid_stream")
      .outputMode(OutputMode.Append()).start()
    holdRows.grouped(2).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("SELECT doc_id, lang_pred FROM langid_stream")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed === compact)
  }
}
