package graft.streaming

import graft.operators.NgramLm
import org.apache.spark.sql.DataFrame

/** Streaming CCNet-style LM quality scoring: documents arrive as a
  * stream and score against a TRAINED static [[NgramLm.Lm]] — the
  * quality-gate half of a streaming ingest pipeline (score on arrival,
  * route by threshold), the LM analogue of
  * [[DedupStream.indexCollisions]]'s stream-vs-static story.
  *
  * Two deployment shapes, chosen by what the consumer aggregates:
  *
  *  - [[scoredGrams]] — completely STATELESS: explode + two
  *    stream-static equi-joins against the trained count tables, one
  *    row per n-gram occurrence. No watermark, no state store; per-doc
  *    reduction happens downstream (or not at all — a per-gram anomaly
  *    tap needs none).
  *  - [[logProbScores]] — per-doc scores via `foreachBatch`: each
  *    micro-batch runs the full batch operator, so results are
  *    batch-identical PROVIDED each document's text arrives whole in
  *    one batch (the ingest contract here — documents are rows, not
  *    token streams). A streaming `groupBy(doc)` aggregation was
  *    REJECTED deliberately: in append mode an un-windowed per-doc agg
  *    never emits (no watermark closes a doc id), and update mode would
  *    emit partial averages — `foreachBatch` is the honest contract,
  *    the same device as [[AnnStream.indexMatchesRefreshing]].
  */
object LmStream {

  /** Stateless per-gram scoring of a streaming document frame: one row
    * per (doc, n-gram occurrence) with its smoothed ln-prob `lp` —
    * [[NgramLm.scoredGrams]] applied verbatim (the operator is a pure
    * Column pipeline, so the SAME code plans as stream-static joins on
    * a streaming input; LmStreamSpec pins batch-identity).
    */
  def scoredGrams(docs: DataFrame, idCol: String, textCol: String,
      lm: NgramLm.Lm, alpha: Double = 0.4): DataFrame =
    NgramLm.scoredGrams(docs, idCol, textCol, lm, alpha)

  /** Stateless per-bigram Kneser–Ney scoring of a streaming frame —
    * [[NgramLm.knScoredGrams]] verbatim (explode + three stream-static
    * equi-joins against the trained KN tables, no state, no
    * watermark); LmStreamSpec pins batch-identity.
    */
  def knScoredGrams(docs: DataFrame, idCol: String, textCol: String,
      lm: NgramLm.KnLm, discount: Double = 0.75): DataFrame =
    NgramLm.knScoredGrams(docs, idCol, textCol, lm, discount)

  /** Per-document scores over a stream via `foreachBatch`:
    * `sink(scores, batchId)` receives [[NgramLm.logProbScore]] of each
    * micro-batch (same schema: idCol, n_grams, avg_lp). Exact when each
    * document arrives whole in one batch — see the object doc for why
    * this beats a streaming aggregation here. Start the returned writer
    * to run the query.
    */
  def logProbScores(docs: DataFrame, idCol: String, textCol: String,
      lm: NgramLm.Lm, alpha: Double = 0.4)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(NgramLm.logProbScore(batch, idCol, textCol, lm, alpha),
          batchId)
    }
}
