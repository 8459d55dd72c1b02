package graft.streaming

import java.sql.Timestamp

import graft.ingest.SparkSpec
import graft.operators.{CrossLingual, QualityFilters}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream ≡ batch for the q327 pipeline's streamable prefix: the
  * chunked stream's KEPT set must equal the batch composition
  * (NOT flagIncremental-dup) ∧ QualityFilters.keep, row for row.
  */
class PipelineStreamSpec extends SparkSpec {

  test("chunked stream kept docs == batch dedup+quality composition; " +
      "dups drop, quality rejects drop, non-Latin passes dedup") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val longText = (1 to 12).map(i => s"unique$i solar term$i")
      .mkString(" ") // 24 distinct tokens, no 3-gram repeats
    val corpus = Seq(
      (1L, longText, "en"),
      (2L, "wind turbine siting rules notice", "de"))
      .toDF("doc_id", "text", "lang")
    val thresholds = QualityFilters.Thresholds(minTokens = 5,
      maxTokens = 1000, maxDupNgramFraction = 0.5)
    // 10: exact fold-dup of corpus doc 1 (different order/case) -> drop;
    // 11: clean and long enough -> KEEP;
    // 12: clean but 3 tokens -> quality drop;
    // 13: fully non-Latin (NULL fp — never a dedup hit), 6 tokens
    //     of distinct CJK "words" -> KEEP (dedup passes, quality sees
    //     6 whitespace tokens)
    val deltaRows = Seq(
      PipelineStream.LangDoc(10L, longText.toUpperCase + "!", "fr",
        new Timestamp(1000L)),
      PipelineStream.LangDoc(11L,
        "fresh policy analysis with enough distinct tokens here", "en",
        new Timestamp(2000L)),
      PipelineStream.LangDoc(12L, "too short doc", "en",
        new Timestamp(3000L)),
      PipelineStream.LangDoc(13L, "气候 政策 框架 审查 报告 摘要", "zh",
        new Timestamp(4000L)))

    val corpusFp = CrossLingual.fingerprintIndex(corpus, "doc_id",
      "text", "lang")
    val mem = MemoryStream[PipelineStream.LangDoc]
    val q = PipelineStream.keptDocs(mem.toDF(), corpusFp, thresholds)
      .writeStream.format("memory").queryName("pipe_kept")
      .outputMode(OutputMode.Append()).start()
    deltaRows.grouped(2).foreach { c =>
      mem.addData(c: _*); q.processAllAvailable()
    }
    q.stop()
    val streamed = s.sql("SELECT * FROM pipe_kept").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"))).toSet

    // batch composition: not-a-dup (flagIncremental) AND quality-kept
    val delta = deltaRows.map(d => (d.doc_id, d.text, d.lang))
      .toDF("doc_id", "text", "lang")
    val dupIds = CrossLingual.flagIncremental(delta, corpus, "doc_id",
        "text", "lang")
      .filter(col("is_dup")).select(col("doc_id")).collect()
      .map(_.getLong(0)).toSet
    val batch = QualityFilters.keep(
        delta.filter(!col("doc_id").isin(dupIds.toSeq: _*)), "text",
        thresholds)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"),
        r.getAs[String]("lang"))).toSet

    assert(streamed === batch)
    assert(streamed.map(_._1) === Set(11L, 13L))
  }
}
