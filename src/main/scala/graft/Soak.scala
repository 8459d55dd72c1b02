package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.time.Instant

import graft.ingest.{Fetcher, FetchResponse, IngestJob, StubConverter}
import graft.model.Schemas.UpdateConfig
import org.apache.spark.sql.SparkSession

/** Throughput soak harness: generates an N-document control file, runs the
  * full two-phase ingest against a deterministic in-memory fetcher, and
  * prints docs/sec. This soak is what exposed the round-1 single-task
  * fetch pinning (a one-file control JSON reads as ONE partition unless
  * phase 2 repartitions) — keep running it whenever the per-document path
  * changes shape (fetch, convert, logging, storage).
  *
  * Usage: runMain graft.Soak [nDocs] (default 5000)
  */
object Soak {

  /** Deterministic fetcher: bytes derived from the URL, no network. */
  class SoakFetcher extends Fetcher {
    override def get(url: String): FetchResponse = {
      val body = (s"%PDF-1.4\n% soak:$url\n" + "x" * 2048 + "\n%%EOF\n")
        .getBytes(UTF_8)
      FetchResponse(200, body, "application/pdf")
    }
  }

  private def doc(i: Int): String =
    s"""{"publication_ts": "2020-01-01T00:00:00",
       |"name": "Soak document $i",
       |"description": "generated soak doc",
       |"source_url": "https://example.com/doc$i.pdf",
       |"download_url": "https://example.com/dl/doc$i.pdf",
       |"url": null, "md5_sum": null,
       |"type": "Law", "source": "SOAK",
       |"import_id": "SOAK.executive.$i.$i",
       |"family_import_id": "SOAK.family.$i.0",
       |"category": "Law", "geography": "IDN",
       |"languages": ["en"],
       |"metadata": {"hazards": [], "frameworks": [], "instruments": [],
       |  "keywords": ["soak"], "sectors": [], "topics": []},
       |"slug": "soak-document-$i",
       |"family_slug": "soak-family-$i"}""".stripMargin.replace("\n", " ")

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val tmp = Files.createTempDirectory("graft-soak")
    val inputDir = tmp.resolve("pipeline/input/soak-run")
    Files.createDirectories(inputDir)
    val control = "{\"new_documents\": [" +
      (0 until n).map(doc).mkString(",") +
      "], \"updated_documents\": {}}"
    Files.write(inputDir.resolve("new_and_updated_documents.json"),
      control.getBytes(UTF_8))

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // soak measures the pipeline, not the log volume: count lines, don't
    // print them
    val logCount = new java.util.concurrent.atomic.AtomicLong
    ingest.JsonLog.sink = _ => logCount.incrementAndGet()

    val cfg = UpdateConfig(
      pipelineRoot = s"file://${tmp.resolve("pipeline")}",
      documentRoot = s"file://${tmp.resolve("cdn")}")
    val t0 = System.nanoTime()
    val report = IngestJob.run(spark, cfg,
      inputDirPath = "input/soak-run",
      updatesFileName = "new_and_updated_documents.json",
      fetcher = new SoakFetcher,
      converter = new StubConverter,
      runTs = Instant.parse("2024-01-01T00:00:00Z"))
    val sec = (System.nanoTime() - t0) / 1e9
    val errs = report.results.count(_.error.isDefined)
    println(f"SOAK docs=$n errors=$errs sec=$sec%.1f " +
      f"docsPerSec=${n / sec}%.1f logLines=${logCount.get()}")
    spark.stop()
    // best-effort cleanup of the generated tree
    import scala.jdk.CollectionConverters._
    Files.walk(tmp).iterator().asScala.toSeq.reverse
      .foreach(p => Files.deleteIfExists(p))
  }
}
