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
      // per-CAPABILITY converter selection (reference Dockerfile installs
      // libreoffice + browser deps): a LibreOffice-only image still
      // converts DOC(X) for real and only HTML capture takes the
      // deterministic stub — probing one binary for both capabilities
      // would either fail every capture at runtime or needlessly stub
      // conversions the image can perform
      converter = {
        val real = new ProcessConverter()
        val stub = new StubConverter()
        val haveSoffice = ProcessConverter.available("soffice")
        val haveChromium = ProcessConverter.available("chromium")
        (haveSoffice, haveChromium) match {
          case (true, true)   => real
          case (false, false) => stub
          case _ => new Converter {
            private val docSide = if (haveSoffice) real else stub
            private val capSide = if (haveChromium) real else stub
            def docToPdf(content: Array[Byte]): Array[Byte] =
              docSide.docToPdf(content)
            def capturePdfFromUrl(url: String): (Array[Byte], Option[String]) =
              capSide.capturePdfFromUrl(url)
            def addLastPageWatermark(pdf: Array[Byte], text: String): Array[Byte] =
              real.addLastPageWatermark(pdf, text) // PdfWatermark: no binary
          }
        }
      },
      runTs = Instant.now())

    val errs = report.results.count(_.error.isDefined)
    println(s"[ingest] ${report.results.size} results ($errs errors) -> " +
      report.reportPath)
    spark.stop()
    // row-level failures do NOT fail the job (reference exit-0 contract,
    // test_integration.py:440,494)
  }
}
