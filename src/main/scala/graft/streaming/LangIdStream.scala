package graft.streaming

import java.sql.Timestamp

import graft.operators.TrainedLangId
import org.apache.spark.sql.DataFrame

/** Streaming language identification — the
  * [[TrainedLangId.predictCompact]] scoring on an arriving document
  * stream: the pruned model travels as a literal inside ONE codegen'd
  * aggregate HOF per row (no join, no state, no watermark), so every
  * document is tagged the moment it lands — the routing/mixing tag an
  * ingest pipeline wants BEFORE the batch stages see the data.
  * Stateless append mode; stream ≡ batch is pinned in
  * LangIdStreamSpec because the scoring expression is literally the
  * same Column ([[TrainedLangId.predictExpr]]).
  */
object LangIdStream {

  case class Doc(doc_id: Long, text: String, ts: Timestamp)

  /** Output: every arriving doc plus `lang_pred`. */
  def predictions(docs: DataFrame,
      cm: TrainedLangId.CompactModel): DataFrame =
    docs.withColumn("lang_pred",
      TrainedLangId.predictExpr(docs("text"), cm))
}
