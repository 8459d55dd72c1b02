package graft.streaming

import java.sql.Timestamp

import graft.operators.{CrossLingual, QualityFilters}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The RefinedWeb-style web pipeline (q382) as a STREAM — the
  * round-15 capstone completing the ingest-gate family: each arriving
  * crawled page runs the full pre-content → content → quality chain
  * against YESTERDAY's corpus state, held as two static indexes:
  *
  *  1. URL-canonical probe ([[graft.operators.UrlDedup.urlIndex]] as
  *     the static side; the canonical key is the same single
  *     codegen'd Column program, so the probe is one stream-static
  *     equi-join) — a hit means the page is already in the corpus
  *     under another fetch variant; it drops. NULL canonical keys
  *     (unparseable URLs) never match and PASS — the loud-opt-out
  *     contract.
  *  2. Folded-fingerprint probe ([[CrossLingual.fingerprintIndex]]
  *     static) — the content-grain dedup behind the URL key; NULL
  *     fingerprints (fully non-Latin under the Latin fold) pass.
  *  3. Quality gate ([[QualityFilters.keep]] — a pure row-wise
  *     Column program, stream-safe unchanged).
  *
  * Stateless append-mode contract (the [[PipelineStream]] shape):
  * clean rows emit, duplicates and rejects never appear. The batch
  * q382 runs the SAME operators corpus-wide; the stream form is what
  * the crawler's ingest edge runs between corpus rebuilds.
  */
object WebPipelineStream {

  case class WebDoc(doc_id: Long, url: String, text: String,
    lang: String, ts: Timestamp)

  /** `urlIdx` = [[graft.operators.UrlDedup.urlIndex]] output;
    * `fpIdx` = [[CrossLingual.fingerprintIndex]] output (both
    * static). Output: one row per arriving doc that is neither a
    * URL-variant nor a content-fold duplicate of the corpus and
    * passes the quality thresholds — (doc_id, url, canonical_url,
    * text, lang, ts).
    */
  def keptDocs(docs: DataFrame, urlIdx: DataFrame, fpIdx: DataFrame,
      t: QualityFilters.Thresholds): DataFrame = {
    val afterUrl = docs
      .withColumn("canonical_url",
        graft.functions.Urls.canonicalize(col("url")))
      .join(urlIdx.select(col("curl").as("__icurl"),
        col("matched_id").as("__um")),
        col("canonical_url") === col("__icurl"), "left")
      .filter(col("__um").isNull) // URL hit = duplicate fetch variant
      .drop("__icurl", "__um")
    val afterFp = afterUrl
      .withColumn("fp", CrossLingual.foldedFingerprint(col("text")))
      .join(fpIdx.select(col("fp"), col("matched_id").as("__fm")),
        Seq("fp"), "left")
      .filter(col("__fm").isNull) // fingerprint hit = content dup
      .drop("fp", "__fm")
    QualityFilters.keep(afterFp, "text", t)
      .select(col("doc_id"), col("url"), col("canonical_url"),
        col("text"), col("lang"), col("ts"))
  }
}
