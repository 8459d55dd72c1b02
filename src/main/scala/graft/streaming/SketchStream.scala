package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame

/** Streaming sketch maintenance — the ingest-side deployment of
  * [[Sketches]]: each micro-batch reduces to its own tiny sketch
  * (count–min cells / HLL registers) and the consumer FOLDS batches
  * together with the pure merge operators ([[Sketches.countMinMerge]]'s
  * cell-wise sum, [[Sketches.hllMerge]]'s idx-wise max) — so the
  * running "token frequencies / distinct vocabulary so far" state is a
  * few KB regardless of how much stream has passed. `foreachBatch`
  * rather than a streaming aggregation for the usual reason
  * ([[LmStream]]'s object doc): the sketch is a TABLE-valued reduction,
  * and the merge is the caller's fold (kept in memory, a Delta table,
  * wherever) — SketchStreamSpec pins that the folded stream sketch is
  * cell-identical to the batch sketch of the whole stream.
  */
object SketchStream {

  /** Per-micro-batch count–min cell tables: `sink(cells, batchId)`
    * receives [[Sketches.countMinBuild]] of each batch. Start the
    * returned writer to run the query.
    */
  def countMinBatches(items: DataFrame, itemCol: String, depth: Int,
      width: Int)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(Sketches.countMinBuild(batch, itemCol, depth, width), batchId)
    }

  /** Per-micro-batch HLL register tables: `sink(registers, batchId)`
    * receives [[Sketches.hllRegisters]] of each batch.
    */
  def hllBatches(items: DataFrame, itemCol: String, p: Int)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(Sketches.hllRegisters(batch, itemCol, p), batchId)
    }

  /** Per-micro-batch log-bucket histograms: `sink(hist, batchId)`
    * receives [[Sketches.logHistBuild]] of each batch — fold with
    * [[Sketches.logHistMerge]] (bucket-wise sum) for a running length
    * distribution whose state is ≤ maxBits + 1 rows forever.
    */
  def logHistBatches(items: DataFrame, valueCol: String,
      maxBits: Int = 41)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(Sketches.logHistBuild(batch, valueCol, maxBits), batchId)
    }

  /** Per-micro-batch KMV sketches: `sink(sketch, batchId)` receives
    * [[Sketches.kmvSketchBy]] of each batch — fold with
    * [[Sketches.kmvMerge]] (bottom-k of the union) for a running
    * distinct sketch whose state is k longs per key forever.
    */
  def kmvBatches(items: DataFrame, keyCol: String, itemCol: String,
      k: Int)(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(Sketches.kmvSketchBy(batch, keyCol, itemCol, k), batchId)
    }

  /** Per-micro-batch quantile-sample registers: `sink(regs, batchId)`
    * receives [[graft.operators.QuantileSketch.sampleRegistersBy]] of
    * each batch — fold with
    * [[graft.operators.QuantileSketch.sampleMerge]] (bottom-k of the
    * union) for running per-key quantiles whose state is k (hash,
    * value) rows per key forever; read out any percentile at any time
    * with [[graft.operators.QuantileSketch.sampleQuantilesBy]].
    */
  def quantileSampleBatches(items: DataFrame, keyCol: String,
      idCol: String, valueCol: String, k: Int)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(graft.operators.QuantileSketch.sampleRegistersBy(
          batch, keyCol, idCol, valueCol, k), batchId)
    }

  /** Per-micro-batch WEIGHTED quantile-sample registers — the
    * [[quantileSampleBatches]] contract with Efraimidis–Spirakis
    * retention; fold with
    * [[graft.operators.QuantileSketch.weightedSampleMerge]] for
    * running per-key weighted quantiles.
    */
  def weightedQuantileSampleBatches(items: DataFrame, keyCol: String,
      idCol: String, valueCol: String, weightCol: String, k: Int)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(graft.operators.QuantileSketch.weightedSampleRegistersBy(
          batch, keyCol, idCol, valueCol, weightCol, k), batchId)
    }

  /** Per-micro-batch Misra–Gries summaries:
    * `sink((summary, n), batchId)` receives
    * [[graft.operators.HeavyHitters.summarize]] of each batch — fold
    * with [[graft.operators.HeavyHitters.mergeSummaries]] for a
    * running k-counter frequent-items state. The fold keeps the MG
    * BAND/SUPERSET guarantee over everything streamed so far (exact
    * equality with the whole-stream summary is not the contract — MG
    * is order-dependent below the guarantee; SketchStreamSpec pins
    * the guarantee itself).
    */
  def misraGriesBatches(items: DataFrame, itemCol: String, k: Int)(
      sink: ((Map[String, Long], Long), Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    items.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(graft.operators.HeavyHitters.summarize(batch, itemCol, k),
          batchId)
    }

  /** Per-micro-batch skipping manifests: `sink(manifest, batchId)`
    * receives [[graft.sources.SkippingManifest.build]] of each batch —
    * fold with [[graft.sources.SkippingManifest.merge]] for a
    * continuously maintained layout-stats table (min/max/count are
    * mergeable, so the fold equals a full rebuild EXACTLY, never
    * rescanning history; spec'd in SketchStreamSpec).
    */
  def manifestBatches(rows: DataFrame, shardCol: String,
      statCols: Seq[String])(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    rows.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(graft.sources.SkippingManifest.build(batch, shardCol,
          statCols), batchId)
    }
}
