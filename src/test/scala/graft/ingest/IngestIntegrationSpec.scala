package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.time.Instant

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.model.Schemas.UpdateConfig

/** End-to-end parity run against the reference's own integration fixture
  * tree (`tests/fixtures/pipeline_in` → `pipeline_out`,
  * `test_integration.py:244-387`): the full control file (18 new / 6
  * updated), HTTP stubbed exactly like the reference's requests-mock
  * fixtures, S3 replaced by `file://` through the same Storage layer.
  *
  * Asserted: the reference's exact post-run file counts, report contents,
  * and field-by-field (order-sensitive) JSON equality against the
  * `pipeline_out` goldens excluding the two declared nondeterministic
  * fields (`test_integration.py:330-366`).
  */
object IngestIntegrationSpec {
  val fixtureRoot: Path = Paths.get(
    "/root/reference/src/navigator_data_ingest/tests/fixtures")

  /** The reference's requests-mock stubs (`test_integration.py:97-137`).
    * Top-level (no spec `$outer`) so it serializes to executors.
    */
  class FixtureFetcher extends Fetcher {
    private val pdfBytes =
      Files.readAllBytes(fixtureRoot.resolve("sample.pdf"))
    override def get(url: String): FetchResponse = url match {
      case "https://climatepolicyradar.org/file.pdf" =>
        FetchResponse(200, pdfBytes, "application/pdf")
      case "https://climatepolicyradar.org/page.html" =>
        FetchResponse(200,
          ("<html>\n<head><title>Mocked content</title></head>\n<body>" +
            s"<h1>Mocked content for $url</h1></body>\n</html>\n")
            .getBytes(StandardCharsets.UTF_8),
          "text/html; charset=utf-8")
      case other =>
        throw new HttpStatusError(404, other)
    }
  }
}

class IngestIntegrationSpec extends SparkSpec {

  private val fixtureRoot = IngestIntegrationSpec.fixtureRoot

  private def copyTree(src: Path, dst: Path): Unit =
    Files.walk(src).iterator().asScala.foreach { p =>
      val target = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else {
        Files.createDirectories(target.getParent)
        Files.copy(p, target)
      }
    }

  private def relFiles(root: Path): Seq[String] = {
    if (!Files.exists(root)) return Nil
    Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_))
      // drop Hadoop LocalFileSystem .crc sidecars (absent on s3a/abfs)
      .filter(p => !p.getFileName.toString.startsWith("."))
      .map(p => root.relativize(p).toString).toSeq.sorted
  }

  private val SkipFields = Set("document_md5_sum", "document_cdn_object")

  /** Order-sensitive field-by-field comparison (test_integration.py:330-366). */
  private def compareOrdered(actual: JsonNode, expected: JsonNode,
      context: String, issues: scala.collection.mutable.Buffer[String]): Unit = {
    (actual, expected) match {
      case (a: ObjectNode, e: ObjectNode) =>
        val aFields = a.properties().asScala.map(_.getKey).toSeq
        val eFields = e.properties().asScala.map(_.getKey).toSeq
        if (aFields != eFields)
          issues += s"$context field order: $aFields vs $eFields"
        else aFields.foreach { f =>
          if (!SkipFields.contains(f))
            compareOrdered(a.get(f), e.get(f), s"$context.$f", issues)
        }
      case _ =>
        if (actual != expected)
          issues += s"$context: $actual != $expected"
    }
  }

  test("full fixture run reproduces the reference pipeline_out state") {
    val tmp = Files.createTempDirectory("graft-ingest-it")
    val pipeline = tmp.resolve("pipeline")
    val cdn = tmp.resolve("cdn")
    copyTree(fixtureRoot.resolve("pipeline_in"), pipeline)

    val cfg = UpdateConfig(
      pipelineRoot = s"file://$pipeline",
      documentRoot = s"file://$cdn")
    // O6: capture the structured JSON log stream for the run
    val logLines = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val prevSink = JsonLog.sink
    JsonLog.sink = line => logLines.add(line)
    val report =
      try IngestJob.run(spark, cfg,
        inputDirPath = "input/2022-11-01T21.53.26.945831",
        updatesFileName = "new_and_updated_documents.json",
        fetcher = new IngestIntegrationSpec.FixtureFetcher,
        converter = new StubConverter,
        runTs = Instant.parse("2023-11-21T14:02:40Z"))
      finally JsonLog.sink = prevSink

    // every log record is one structured JSON object (reference
    // main.py:22-61) tagging the document it concerns
    val parsed = logLines.asScala.toSeq.map(PyJson.parse)
    assert(parsed.nonEmpty)
    parsed.foreach { n =>
      assert(n.has("written_at") && n.has("level") && n.has("msg"),
        s"log line missing required fields: $n")
    }
    val handled = parsed.filter(_.get("msg").asText.startsWith("Handling document"))
    assert(handled.size === 18) // one per new document
    assert(handled.forall(n => n.get("document_id").asText.nonEmpty))
    val uploaded = parsed.filter(_.get("msg").asText.startsWith("Uploaded content"))
    assert(uploaded.size === 17) // 1 of the 18 is a no-URL skip
    assert(parsed.forall(_.get("level").asText != "ERROR"))

    // report: 18 new + 6 updated, zero errors (test_integration.py:282-296)
    assert(report.results.count(_.ingest_type == "new") === 18)
    assert(report.results.count(_.ingest_type == "updated") === 6)
    assert(report.results.flatMap(_.error) === Seq.empty)

    // post-run file counts (test_integration.py:303-328,373-387)
    assert(relFiles(pipeline.resolve("input")).size === 3)
    assert(relFiles(pipeline.resolve("archive")).size === 15)
    assert(relFiles(pipeline.resolve("embeddings_input")).size === 3)
    assert(relFiles(pipeline.resolve("parser_input")).size === 22)
    assert(relFiles(pipeline.resolve("indexer_input")).size === 0)

    val npy = relFiles(pipeline).filter(_.endsWith(".npy")).sorted
    assert(npy.size === 5)
    assert(npy.head.startsWith("archive/indexer_input/TESTCCLW.executive.1.1/"))
    assert(npy(1).startsWith("archive/indexer_input/TESTCCLW.executive.2.2/"))

    // 16 distinct CDN objects (test_integration.py:384-387)
    assert(relFiles(cdn).size === 16)

    // golden JSON parity, field order included (test_integration.py:330-366)
    val issues = scala.collection.mutable.ArrayBuffer[String]()
    for (prefix <- Seq("parser_input", "embeddings_input");
         rel <- relFiles(pipeline.resolve(prefix))) {
      val actual = PyJson.parse(new String(
        Files.readAllBytes(pipeline.resolve(prefix).resolve(rel)),
        StandardCharsets.UTF_8))
      val goldenPath = fixtureRoot.resolve("pipeline_out")
        .resolve(prefix).resolve(rel)
      assert(Files.exists(goldenPath), s"unexpected output $prefix/$rel")
      val expected = PyJson.parse(new String(
        Files.readAllBytes(goldenPath), StandardCharsets.UTF_8))
      compareOrdered(actual, expected, s"$prefix/$rel", issues)
    }
    assert(issues.isEmpty, issues.mkString("\n"))
  }

  test("error-path run: broken downloads become row errors, job completes") {
    val tmp = Files.createTempDirectory("graft-ingest-err")
    val pipeline = tmp.resolve("pipeline")
    val cdn = tmp.resolve("cdn")
    // control file with 2 new docs whose URLs 404 + 2 updated ids
    // (reference fixtures/small, test_integration.py:453-517)
    copyTree(fixtureRoot.resolve("pipeline_in"), pipeline)
    val small = new String(Files.readAllBytes(
      fixtureRoot.resolve("small/new_and_updated_documents.json")),
      StandardCharsets.UTF_8)
    Files.write(pipeline.resolve(
      "input/2022-11-01T21.53.26.945831/new_and_updated_documents.json"),
      small.getBytes(StandardCharsets.UTF_8))

    val cfg = UpdateConfig(
      pipelineRoot = s"file://$pipeline",
      documentRoot = s"file://$cdn")
    val report = IngestJob.run(spark, cfg,
      inputDirPath = "input/2022-11-01T21.53.26.945831",
      updatesFileName = "new_and_updated_documents.json",
      fetcher = new IngestIntegrationSpec.FixtureFetcher,
      converter = new StubConverter,
      runTs = Instant.parse("2023-11-21T14:02:40Z"))

    val errors = report.results.flatMap(_.error)
    assert(errors.nonEmpty)
    assert(errors.forall(_.contains("404 Client Error")))
    // errored new docs write no parser input, but the job still reports
    // every document (test_integration.py:500-517)
    assert(report.results.nonEmpty)
  }
}
