package graft.streaming

import graft.operators.QualityClassifier
import graft.operators.QualityClassifier.NbModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming classifier-gated ingest: documents arrive as a stream and
  * score against a TRAINED static [[NbModel]] — the "accept/route on
  * arrival" half of classifier-based quality filtering, the NB analogue
  * of [[LmStream]]'s trained-LM story and the same two deployment
  * shapes:
  *
  *  - [[tokenLlrRows]] — completely STATELESS: explode + ONE
  *    stream-static equi-join against the trained llr table, one row
  *    per token occurrence with its llr contribution. No watermark, no
  *    state store.
  *  - [[scores]] — per-doc verdicts via `foreachBatch`: each
  *    micro-batch runs the batch operator verbatim, so results are
  *    batch-identical provided each document arrives whole in one
  *    batch (the row-per-document ingest contract; see
  *    [[LmStream.logProbScores]] for why a streaming per-doc agg was
  *    rejected — an un-windowed doc aggregation either never emits in
  *    append mode or emits partial scores in update mode).
  */
object ClassifierStream {

  /** Stateless per-token llr stage on a streaming frame: (idCol, token,
    * llr) with OOV tokens carrying the model's smoothing floor. Plans
    * as a stream-static join (ClassifierStreamSpec pins batch parity).
    */
  def tokenLlrRows(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel): DataFrame =
    docs
      .withColumn("__cs_toks",
        graft.functions.TextFunctions.tokens(col(textCol)))
      .select(col(idCol), explode(col("__cs_toks")).as("token"))
      .join(model.llr, Seq("token"), "left")
      .select(col(idCol), col("token"),
        coalesce(col("llr"), lit(model.oovLlr)).as("llr"))

  /** Per-document (score, predicted) over a stream via `foreachBatch`:
    * `sink(scored, batchId)` receives [[QualityClassifier.score]] of
    * each micro-batch. Start the returned writer to run the query.
    */
  def scores(docs: DataFrame, idCol: String, textCol: String,
      model: NbModel)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(QualityClassifier.score(batch, idCol, textCol, model),
          batchId)
    }
}
