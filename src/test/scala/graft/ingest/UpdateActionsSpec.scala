package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.time.Instant

import graft.model.Mappings.Actions
import graft.model.Schemas.{Update, UpdateConfig}
import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Unit tables for the update path, ported from the reference's own
  * dispatch/ordering tests (`tests/test_update_actions.py:18-38`) plus
  * file-level post-state checks against a file:// cache tree
  * (`tests/test_update_actions.py:40-181`).
  */
class UpdateActionsSpec extends AnyFunSuite {

  private val conf = new Configuration()

  test("dispatch table matches the reference (7 update types)") {
    assert(Updates.dispatch("source_url") === Actions.Parse)
    assert(Updates.dispatch("reprocess") === Actions.Parse)
    assert(Updates.dispatch("name") === Actions.UpdateDontParse)
    assert(Updates.dispatch("description") === Actions.UpdateDontParse)
    assert(Updates.dispatch("metadata") === Actions.UpdateDontParse)
    assert(Updates.dispatch("slug") === Actions.UpdateFieldInAllOccurences)
    assert(Updates.dispatch("reparse") === Actions.Reparse)
    val e = intercept[IllegalArgumentException](Updates.dispatch("bogus"))
    assert(e.getMessage.contains("not a valid UpdateTypes"))
  }

  test("order_actions: parse short-circuits; update_dont_parse sorts last, stable") {
    def u(t: String) = Update(t, None, None)
    // any parse → only the FIRST parse action survives
    val withParse = Seq(
      (u("name"), Actions.UpdateDontParse),
      (u("source_url"), Actions.Parse),
      (u("reprocess"), Actions.Parse))
    assert(Updates.orderActions(withParse) ===
      Seq((u("source_url"), Actions.Parse)))
    // no parse → stable sort, update_dont_parse last
    val noParse = Seq(
      (u("name"), Actions.UpdateDontParse),
      (u("slug"), Actions.UpdateFieldInAllOccurences),
      (u("description"), Actions.UpdateDontParse),
      (u("reparse"), Actions.Reparse))
    assert(Updates.orderActions(noParse).map(_._1.`type`) ===
      Seq("slug", "reparse", "name", "description"))
  }

  test("updateFileField: edit, missing-file no-op, missing-field error") {
    val tmp = Files.createTempDirectory("graft-u7")
    val doc = tmp.resolve("d.json")
    Files.write(doc,
      """{"document_name": "old", "zzz_unknown": {"keep": [1, 2]}, "document_description": "d"}"""
        .getBytes(StandardCharsets.UTF_8))

    // happy edit: value replaced, unknown field + order preserved
    assert(Updates.updateFileField(s"file://$doc", "name",
      Some("\"new name\""), Some("\"old\""), conf) === None)
    val after = new String(Files.readAllBytes(doc), StandardCharsets.UTF_8)
    assert(after ===
      """{"document_name": "new name", "zzz_unknown": {"keep": [1, 2]}, "document_description": "d"}""")

    // missing file → benign no-op (None)
    assert(Updates.updateFileField(s"file://$tmp/nope.json", "name",
      Some("\"x\""), None, conf) === None)

    // missing FIELD → error string
    val err = Updates.updateFileField(s"file://$doc", "slug",
      Some("\"s\""), None, conf)
    assert(err.exists(_.contains("document_slug")))
  }

  test("parse action archives every artifact; reparse keeps parser_input") {
    val tmp = Files.createTempDirectory("graft-u5")
    val cfg = UpdateConfig(s"file://$tmp", s"file://$tmp/cdn")
    val ts = Instant.parse("2023-11-21T14:02:40Z")
    for (p <- Seq("parser_input", "embeddings_input", "indexer_input")) {
      Files.createDirectories(tmp.resolve(p))
      Files.write(tmp.resolve(s"$p/D.1.json"), "{}".getBytes)
    }
    Files.write(tmp.resolve("indexer_input/D.1.npy"), Array[Byte](1, 2))

    assert(Updates.parse("D.1", Update("source_url", None, None),
      cfg, ts, conf) === Seq.empty)
    for (p <- Seq("parser_input", "embeddings_input", "indexer_input"))
      assert(!Files.exists(tmp.resolve(s"$p/D.1.json")), p)
    assert(Files.exists(tmp.resolve(
      "archive/indexer_input/D.1/2023-11-21-14-02-40.npy")))
    assert(Files.exists(tmp.resolve(
      "archive/parser_input/D.1/2023-11-21-14-02-40.json")))

    // reparse on a fresh tree keeps parser_input
    val tmp2 = Files.createTempDirectory("graft-u10")
    val cfg2 = UpdateConfig(s"file://$tmp2", s"file://$tmp2/cdn")
    for (p <- Seq("parser_input", "embeddings_input", "indexer_input")) {
      Files.createDirectories(tmp2.resolve(p))
      Files.write(tmp2.resolve(s"$p/D.1.json"), "{}".getBytes)
    }
    assert(Updates.reparse("D.1", Update("reparse", None, None),
      cfg2, ts, conf) === Seq.empty)
    assert(Files.exists(tmp2.resolve("parser_input/D.1.json")))
    assert(!Files.exists(tmp2.resolve("embeddings_input/D.1.json")))
    assert(!Files.exists(tmp2.resolve("indexer_input/D.1.json")))
  }
}
