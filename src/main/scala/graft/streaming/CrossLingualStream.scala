package graft.streaming

import java.sql.Timestamp

import graft.operators.CrossLingual
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming cross-lingual dedup — the
  * [[graft.operators.CrossLingual.flagIncremental]] semantics as a
  * STREAM-STATIC join: yesterday's corpus is folded and fingerprinted
  * ONCE ([[CrossLingual.fingerprintIndex]] — the static side, at 100 TB
  * a partition-pruned index read); today's documents arrive as a
  * stream, fold per row (pure codegen'd Column program — no state, no
  * watermark), and every fingerprint HIT emits the moment it lands,
  * with the matched canonical and the cross-lingual bit.
  *
  * Stateless append-mode contract: only HITS emit (the batch form's
  * left-join "no match" rows have no stateless streaming analogue —
  * an absent match can't be asserted mid-stream); consumers treat
  * unflagged docs as clean, exactly like [[DedupStream.indexCollisions]].
  */
object CrossLingualStream {

  case class LangDoc(doc_id: Long, text: String, lang: String,
    ts: Timestamp)

  /** `corpusFp` is [[CrossLingual.fingerprintIndex]] output (static).
    * Output: (doc_id, lang, ts, matched_id, matched_langs,
    * is_cross_lingual) — one row per arriving doc whose folded
    * fingerprint exists in the corpus.
    */
  def collisions(docs: DataFrame, corpusFp: DataFrame): DataFrame =
    collisionsBy(docs, corpusFp,
      CrossLingual.foldedFingerprint(col("text")))

  /** [[collisions]] under the SCRIPT-AWARE fold — pair with
    * [[CrossLingual.fingerprintIndexScripted]] as the static side so
    * zh/ja/ru arrivals collide with their corpus copies instead of
    * folding to NULL and slipping through (the round-15 scripted
    * contract; batch form [[CrossLingual.flagIncrementalScripted]]).
    */
  def collisionsScripted(docs: DataFrame,
      corpusFp: DataFrame): DataFrame =
    collisionsBy(docs, corpusFp,
      CrossLingual.foldedFingerprintScripted(col("text")))

  private def collisionsBy(docs: DataFrame, corpusFp: DataFrame,
      fp: org.apache.spark.sql.Column): DataFrame =
    docs
      .withColumn("fp", fp)
      .join(corpusFp, Seq("fp")) // stream-static equi-join, stateless
      .select(col("doc_id"), col("lang"), col("ts"),
        col("matched_id"),
        array_join(col("__langs"), ",").as("matched_langs"),
        (!array_contains(col("__langs"), col("lang")))
          .as("is_cross_lingual"))
}
