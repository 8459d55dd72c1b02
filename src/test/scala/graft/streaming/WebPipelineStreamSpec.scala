package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.operators.{CrossLingual, QualityFilters, UrlDedup}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream ≡ batch for the q382 web chain: the chunked stream's KEPT
  * set must equal the batch composition (URL-index miss ∧ fp-index
  * miss ∧ quality keep), row for row — URL variants drop at the
  * cheap pre-content key, folded content dups drop behind it,
  * unparseable URLs and non-Latin folds opt OUT of their stage and
  * pass through.
  */
class WebPipelineStreamSpec extends SparkSpec {

  test("chunked stream kept docs == batch url+fp+quality composition") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val longText = (1 to 12).map(i => s"unique$i solar term$i")
      .mkString(" ")
    val corpus = Seq(
      (1L, "https://www.example.com/a?utm_source=x&p=1", longText, "en"),
      (2L, "https://example.com/b", "wind turbine siting rules notice",
        "de")).toDF("doc_id", "url", "text", "lang")
    val thresholds = QualityFilters.Thresholds(minTokens = 5,
      maxTokens = 1000, maxDupNgramFraction = 0.5)
    val urlIdx = UrlDedup.urlIndex(corpus, "doc_id", "url")
    val fpIdx = CrossLingual.fingerprintIndex(corpus, "doc_id",
      "text", "lang")

    // 10: URL variant of corpus doc 1 (case/port/param-order/percent)
    //     with FRESH text -> drops at the URL stage;
    // 11: new URL but exact fold-dup of corpus doc 1 -> drops at fp;
    // 12: clean on both keys, long enough -> KEEP;
    // 13: unparseable URL (opts out of URL dedup) + clean text -> KEEP;
    // 14: clean keys but 3 tokens -> quality drop
    val deltaRows = Seq(
      WebPipelineStream.WebDoc(10L,
        "HTTPS://Example.COM:443/a?p=1",
        "completely new text that would have survived content dedup",
        "en", new Timestamp(1000L)),
      WebPipelineStream.WebDoc(11L, "https://example.com/fresh-path",
        longText.toUpperCase + "!", "fr", new Timestamp(2000L)),
      WebPipelineStream.WebDoc(12L, "https://example.com/new-page",
        "fresh policy analysis with enough distinct tokens here",
        "en", new Timestamp(3000L)),
      WebPipelineStream.WebDoc(13L, "not a url",
        "parseable content behind an unparseable locator keeps flowing",
        "en", new Timestamp(4000L)),
      WebPipelineStream.WebDoc(14L, "https://example.com/short",
        "too short doc", "en", new Timestamp(5000L)))

    val mem = MemoryStream[WebPipelineStream.WebDoc]
    val q = WebPipelineStream.keptDocs(mem.toDF(), urlIdx, fpIdx,
        thresholds)
      .writeStream.format("memory").queryName("web_kept")
      .outputMode(OutputMode.Append()).start()
    deltaRows.grouped(2).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("SELECT * FROM web_kept").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .toSet

    // batch composition over the same operators
    val delta = deltaRows.map(d => (d.doc_id, d.url, d.text, d.lang))
      .toDF("doc_id", "url", "text", "lang")
    val urlDup = UrlDedup.flagAgainstIndex(delta, urlIdx, "doc_id",
        "url")
      .filter(col("is_dup")).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val fpDup = CrossLingual.flagIncremental(
        delta.filter(!col("doc_id").isin(urlDup.toSeq: _*)), corpus,
        "doc_id", "text", "lang")
      .filter(col("is_dup")).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val batch = QualityFilters.keep(
        delta.filter(!col("doc_id")
          .isin((urlDup ++ fpDup).toSeq: _*)), "text", thresholds)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .toSet

    assert(streamed === batch)
    assert(streamed.map(_._1) === Set(12L, 13L))
  }

  test("chunked keptLines stream == batch anti-join; foreachBatch " +
      "rebuild == removeDuplicatedLines on the index's own corpus") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val corpus = Seq(
      (1L, "HDR\nalpha one\nFTR"), (2L, "HDR\nbeta two\nFTR"),
      (3L, "HDR\ngamma three\nFTR"))
      .toDF("doc_id", "text")
    val dupIdx = graft.operators.Boilerplate
      .duplicatedLineIndex(corpus, "doc_id", "text", maxDf = 2)

    val deltaRows = Seq(
      WebPipelineStream.WebDoc(10L, "u", "HDR\nfresh delta body\nFTR",
        "en", new Timestamp(1000L)),
      WebPipelineStream.WebDoc(11L, "u", "HDR\nFTR", // pure template
        "en", new Timestamp(2000L)),
      WebPipelineStream.WebDoc(12L, "u", "no template at all",
        "en", new Timestamp(3000L)))
    val mem = MemoryStream[WebPipelineStream.WebDoc]
    val q = WebPipelineStream.keptLines(mem.toDF(), dupIdx)
      .writeStream.format("memory").queryName("kept_lines")
      .outputMode(OutputMode.Append()).start()
    deltaRows.grouped(2).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("SELECT doc_id, line_pos, line FROM kept_lines")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(streamed === Set((10L, 1, "fresh delta body"),
      (12L, 0, "no template at all")))

    // the foreachBatch rebuild is the SAME join device — and against
    // the index's own corpus it reproduces removeDuplicatedLines
    val viaIndex = graft.operators.Boilerplate
      .removeLinesAgainstIndex(corpus, dupIdx, "doc_id", "text")
      .select(col("doc_id"), col("n_lines"), col("n_removed"),
        col("clean_text"))
      .collect().map(_.toString).sorted.toSeq
    val direct = graft.operators.Boilerplate
      .removeDuplicatedLines(corpus, "doc_id", "text", maxDf = 2)
      .select(col("doc_id"), col("n_lines"), col("n_removed"),
        col("clean_text"))
      .collect().map(_.toString).sorted.toSeq
    assert(viaIndex === direct)
  }
}
