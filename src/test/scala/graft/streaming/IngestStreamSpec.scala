package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Instant

import scala.jdk.CollectionConverters._

import graft.ingest.{IngestIntegrationSpec, PyJson => PyJsonHelper, SparkSpec, StubConverter}
import graft.model.Schemas.UpdateConfig

/** Streaming ingest: a control file appearing in the watched directory is
  * processed exactly once; a second file in a later micro-batch is picked
  * up incrementally (file-source checkpointing).
  */
class IngestStreamSpec extends SparkSpec {

  private val fixtureRoot = IngestIntegrationSpec.fixtureRoot

  test("control files are ingested as they arrive, exactly once") {
    val tmp = Files.createTempDirectory("graft-stream")
    val pipeline = tmp.resolve("pipeline")
    Files.createDirectories(pipeline.resolve("incoming"))
    val cfg = UpdateConfig(
      pipelineRoot = s"file://$pipeline",
      documentRoot = s"file://${tmp.resolve("cdn")}")

    // drop the full fixture control file in before starting
    val control = fixtureRoot.resolve(
      "pipeline_in/input/2022-11-01T21.53.26.945831/new_and_updated_documents.json")
    Files.copy(control, pipeline.resolve("incoming/batch1.json"))

    val q = IngestStream.start(spark, cfg, "incoming/*.json",
      s"$tmp/ckpt", new IngestIntegrationSpec.FixtureFetcher,
      new StubConverter, clock = () => Instant.parse("2023-11-21T14:02:40Z"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    q.processAllAvailable()

    def parserInputs: Seq[String] =
      Files.list(pipeline.resolve("parser_input")).iterator().asScala
        .map(_.getFileName.toString).filterNot(_.startsWith(".")).toSeq
    assert(parserInputs.size === 18) // all new docs from the control file

    // a second control file arrives carrying ONE new document (id
    // swapped so its parser input is distinguishable from batch 1's)
    val one = {
      val full = PyJsonHelper.parse(new String(Files.readAllBytes(control),
        StandardCharsets.UTF_8))
      val doc = full.get("new_documents").get(0)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      doc.put("import_id", "STREAM.batch2.1")
      s"""{"new_documents": [${doc.toString}], "updated_documents": {}}"""
    }
    Files.write(pipeline.resolve("incoming/batch2.json"),
      one.getBytes(StandardCharsets.UTF_8))
    q.processAllAvailable()
    q.stop()

    // batch 2 processed incrementally; batch 1 NOT reprocessed
    val after = parserInputs
    assert(after.size === 19, after.sorted.mkString(","))
    assert(after.contains("STREAM.batch2.1.json"))
  }
}
