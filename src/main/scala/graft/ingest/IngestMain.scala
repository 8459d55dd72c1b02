package graft.ingest

import java.time.Instant

import graft.model.Schemas.UpdateConfig
import org.apache.spark.sql.SparkSession

/** CLI entry point (SURVEY.md §2 O1 — reference `main.py:64-125`): the
  * same options as the reference's click command, over generic Hadoop-FS
  * roots instead of raw bucket names.
  *
  * {{{
  * runMain graft.ingest.IngestMain \
  *   --pipeline-root file:///data/pipeline \
  *   --document-root file:///data/cdn \
  *   --input-dir-path input/2022-11-01T21.53.26.945831 \
  *   [--updates-file-name new_and_updated_documents.json] \
  *   [--output-prefix parser_input] [--embeddings-input-prefix embeddings_input]
  *   [--indexer-input-prefix indexer_input] [--archive-prefix archive]
  * }}}
  *
  * Parallelism is task slots (the reference's `--worker-count` maps to
  * Spark's master/parallelism settings, SURVEY.md §4).
  */
object IngestMain {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    def req(k: String): String = opts.getOrElse(k,
      sys.error(s"missing required option --$k"))

    val cfg = UpdateConfig(
      pipelineRoot = req("pipeline-root").stripSuffix("/"),
      documentRoot = req("document-root").stripSuffix("/"),
      parserInputPrefix = opts.getOrElse("output-prefix", "parser_input"),
      embeddingsInputPrefix =
        opts.getOrElse("embeddings-input-prefix", "embeddings_input"),
      indexerInputPrefix =
        opts.getOrElse("indexer-input-prefix", "indexer_input"),
      archivePrefix = opts.getOrElse("archive-prefix", "archive"))

    val spark = SparkSession.builder()
      .appName("graft-ingest")
      // spark-submit injects the real master; default for direct runs
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val report = IngestJob.run(spark, cfg,
      inputDirPath = req("input-dir-path"),
      updatesFileName =
        opts.getOrElse("updates-file-name", "new_and_updated_documents.json"),
      fetcher = new JdkHttpFetcher(),
      // real converters only where the executor image ships BOTH binaries
      // (reference Dockerfile installs libreoffice + browser deps):
      // probing soffice alone would select ProcessConverter on a
      // LibreOffice-only image and then fail every HTML-capture document
      // at runtime in capturePdfFromUrl. The deterministic stub keeps
      // partial/binary-less environments runnable
      converter =
        if (ProcessConverter.available("soffice") &&
            ProcessConverter.available("chromium")) new ProcessConverter()
        else new StubConverter(),
      runTs = Instant.now())

    val errs = report.results.count(_.error.isDefined)
    println(s"[ingest] ${report.results.size} results ($errs errors) -> " +
      report.reportPath)
    spark.stop()
    // row-level failures do NOT fail the job (reference exit-0 contract,
    // test_integration.py:440,494)
  }
}
