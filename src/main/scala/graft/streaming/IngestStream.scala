package graft.streaming

import java.time.Instant

import graft.ingest._
import graft.model.Schemas.{BackendDocument, UpdateConfig}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous ingest: the reference is a single-shot batch job re-run per
  * control file (SURVEY.md §3.1); this wrapper turns the same
  * new-document pipeline into a Structured Streaming job that watches
  * the control-file directory and processes each arriving file exactly
  * once (file-source checkpointing), writing the same per-document
  * parser-input records and blobs.
  *
  * Shape: `readStream` (file source, one row per control file) →
  * `foreachBatch` running the SAME batch stages (explode → effectful
  * fetch partitions → sinks) — the unified-API pattern that keeps one
  * implementation for both deployment modes. Updates stay batch-only:
  * their strict per-document ordering against new-doc ingestion
  * (SURVEY.md §2 O2) has no streaming analogue in the reference.
  */
object IngestStream {

  /** Start the stream. Control files appearing under
    * `{pipelineRoot}/{inputGlob}` are parsed and their new documents
    * ingested each micro-batch.
    */
  def start(
      spark: SparkSession,
      cfg: UpdateConfig,
      inputGlob: String,
      checkpointDir: String,
      fetcher: Fetcher,
      converter: Converter,
      runTs: Instant,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val conf = new SerializableConf(spark.sparkContext.hadoopConfiguration)
    val control = spark.readStream
      .schema(ControlFile.pipelineUpdatesSchema)
      .option("multiLine", true)
      .json(s"${cfg.pipelineRoot}/$inputGlob")

    control.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        // same single-file-partition hazard as the batch job: spread the
        // fetch work over the executor slots
        val newDocs = ControlFile.newDocuments(batch).as[BackendDocument]
          .repartition(spark.sparkContext.defaultParallelism)
        val processed = NewDocuments.process(
          newDocs, cfg.documentRoot, fetcher, converter, runTs, conf)
        processed.persist()
        val n = processed.count()
        NewDocuments.writeParserInputs(processed,
          s"${cfg.pipelineRoot}/${cfg.parserInputPrefix}", conf)
        val errs = processed.filter((p: NewDocuments.Processed) =>
          p.error.isDefined).count()
        processed.unpersist()
        System.err.println(
          s"[ingest-stream] batch $batchId: $n documents, $errs errors")
        ()
      }
      .start()
  }
}
