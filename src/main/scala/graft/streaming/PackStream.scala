package graft.streaming

import graft.operators.Packing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sequence packing — the shard-writer deployment of
  * [[Packing]]: each micro-batch of an ID-ORDERED document stream (the
  * append-log contract: later batches carry strictly larger ids, the
  * same ordering [[Packing.packSequences]] itself keys on) packs
  * against the running token offset, so the spans across all batches
  * are IDENTICAL to packing the whole stream at once — sequences that
  * straddle a batch boundary come out right because the offset, ONE
  * long of carried state, places the next batch mid-sequence.
  * `foreachBatch` for the usual reason ([[SketchStream]]'s doc): the
  * result is a table the caller lands per batch; PackStreamSpec pins
  * the fold ≡ whole-stream identity.
  */
object PackStream {

  /** Per-micro-batch packed spans: `sink(packed, batchId)` receives
    * [[Packing.packSequences]] of each batch at the carried offset.
    * Start the returned writer to run the query.
    *
    * Restart caveat (deliberate): the carried offset lives in this
    * writer's closure, NOT in checkpointed state — a restarted query
    * re-packs from offset 0. A deployment that must survive restarts
    * persists the offset alongside each batch's output (it is one
    * long; the last batch's `max(seq_id · seqLen + seq_off + span)`
    * reconstructs it) and passes it to a fresh `packSequences` via
    * `startOffset` — the same seam the spec drives.
    */
  def packBatches(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] = {
    // the one piece of carried state: total tokens seen before this
    // batch (driver-side — foreachBatch bodies run on the driver)
    var offset = 0L
    docs.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        // scoped: packSequences' internal window cache is released at
        // batch end; `packed` itself is persisted because both the
        // sink's action and the offset-advance aggregation read it
        graft.CacheScope.scoped {
          val packed = Packing.packSequences(batch, idCol, textCol,
            seqLen, startOffset = offset).persist()
          try {
            sink(packed, batchId)
            offset += packed
              .agg(coalesce(sum(col("doc_to") - col("doc_from")),
                lit(0L)))
              .head().getLong(0)
          } finally packed.unpersist()
        }
    }
  }
}
