package graft.ingest

import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.node.ObjectNode
import graft.model.Schemas.BackendDocument

/** Serializer for the per-document parser-input record
  * (reference `base/new_document_actions.py:88-95`; golden shape
  * `tests/fixtures/pipeline_out/parser_input/TESTCCLW.executive.1332.1547.json`).
  *
  * Field order is part of the output contract (the reference integration
  * test asserts it, `test_integration.py:353-358`), so the record is built
  * as an insertion-ordered ObjectNode and rendered with the
  * `json.dumps(indent=2)`-compatible [[PyJson]] writer.
  */
object ParserInputJson {

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  private def put(o: ObjectNode, k: String, v: Option[String]): Unit =
    v match {
      case Some(s) => o.put(k, s)
      case None => o.putNull(k)
    }

  /** The embedded `document_metadata` — the full source BackendDocument
    * plus the null-filled extra cpr-sdk fields, in cpr-sdk declaration
    * order (golden fixture lines 11-56).
    */
  def documentMetadataNode(doc: BackendDocument): ObjectNode = {
    val m = PyJson.obj()
    Seq("collection_summary", "collection_title", "corpus_type_name",
      "corpus_import_id", "document_title", "geographies")
      .foreach(m.putNull)
    m.put("name", doc.name)
    m.put("description", doc.description)
    m.put("import_id", doc.import_id)
    m.put("slug", doc.slug)
    m.put("family_import_id", doc.family_import_id)
    m.put("family_slug", doc.family_slug)
    m.put("publication_ts",
      tsFmt.format(doc.publication_ts.toInstant.atOffset(ZoneOffset.UTC)))
    m.putNull("date")
    put(m, "source_url", doc.source_url)
    put(m, "download_url", doc.download_url)
    m.put("type", doc.`type`)
    m.put("source", doc.source)
    m.put("category", doc.category)
    m.put("geography", doc.geography)
    val langs = m.putArray("languages")
    Option(doc.languages).getOrElse(Nil).foreach(langs.add)
    val meta = m.putObject("metadata")
    Seq(
      "hazards" -> doc.metadata.hazards,
      "frameworks" -> doc.metadata.frameworks,
      "instruments" -> doc.metadata.instruments,
      "keywords" -> doc.metadata.keywords,
      "sectors" -> doc.metadata.sectors,
      "topics" -> doc.metadata.topics
    ).foreach { case (k, vs) =>
      val arr = meta.putArray(k)
      Option(vs).getOrElse(Nil).foreach(arr.add)
    }
    m
  }

  /** Full parser-input record (golden fixture lines 1-57). */
  def render(doc: BackendDocument, cdnObject: Option[String],
      contentType: Option[String], md5Sum: Option[String]): String = {
    val o = PyJson.obj()
    o.put("document_id", doc.import_id)
    o.put("document_name", doc.name)
    o.put("document_description", doc.description)
    put(o, "document_source_url", doc.source_url)
    put(o, "document_cdn_object", cdnObject)
    put(o, "document_content_type", contentType)
    put(o, "document_md5_sum", md5Sum)
    o.put("document_slug", doc.slug)
    o.set[ObjectNode]("document_metadata", documentMetadataNode(doc))
    o.putObject("pipeline_metadata")
    PyJson.dumps(o, indent = 2)
  }
}
