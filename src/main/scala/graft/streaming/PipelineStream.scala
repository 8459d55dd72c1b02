package graft.streaming

import java.sql.Timestamp

import graft.operators.{CrossLingual, QualityFilters}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming multilingual ingest gate — the q327 corpus pipeline's
  * first two stages as a STREAM: each arriving document is
  * (1) probed against yesterday's corpus fingerprint index
  * ([[CrossLingual.fingerprintIndex]] — the static side of a
  * stream-static equi-join; fingerprint hits drop as duplicates), and
  * (2) gated by the quality rules (a pure row-wise Column program, so
  * it runs on a stream unchanged). What emits is the KEPT stream a
  * downstream α-sampling batch stage consumes; the budget mix itself
  * ([[graft.operators.Mixture.languageBudgetMix]]) is corpus-global
  * state BY DESIGN and stays batch — a per-language prefix cut over
  * all of today's survivors cannot be decided mid-stream.
  *
  * Stateless append-mode contract, like
  * [[CrossLingualStream.collisions]] but inverted: the CLEAN rows
  * emit (dedup is a left join + matched-null filter — Structured
  * Streaming supports stream-static left outer with the stream on the
  * left), duplicates and quality rejects simply never appear.
  * Empty-fold documents (NULL fingerprint — fully non-Latin text)
  * never match the index and pass the dedup stage, exactly like the
  * batch form.
  */
object PipelineStream {

  case class LangDoc(doc_id: Long, text: String, lang: String,
    ts: Timestamp)

  /** `corpusFp` is [[CrossLingual.fingerprintIndex]] output (static).
    * Output: (doc_id, text, lang, ts) — one row per arriving doc that
    * is NOT an exact cross-lingual duplicate of the corpus and passes
    * the quality thresholds.
    */
  def keptDocs(docs: DataFrame, corpusFp: DataFrame,
      t: QualityFilters.Thresholds): DataFrame = {
    val fresh = docs
      .withColumn("fp", CrossLingual.foldedFingerprint(col("text")))
      .join(corpusFp.select(col("fp"), col("matched_id")),
        Seq("fp"), "left")
      .filter(col("matched_id").isNull) // fingerprint hit = duplicate
    QualityFilters.keep(fresh, "text", t)
      .select(col("doc_id"), col("text"), col("lang"), col("ts"))
  }
}
