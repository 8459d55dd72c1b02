package graft.ingest

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.Locale

/** Content normalization to PDF (reference `base/pdf_conversion.py`).
  *
  * An interface because the real implementations are heavyweight external
  * processes — LibreOffice for DOC(X) (`pdf_conversion.py:17-54`), headless
  * Chromium for HTML capture (`pdf_conversion.py:57-106`), a PDF library
  * for the watermark page (`pdf_conversion.py:125-160`). The engine's
  * dataflow (content-type dispatch, per-partition effect isolation,
  * watermarking order) is identical whichever converter is plugged in;
  * tests and this container use the deterministic [[StubConverter]]. A
  * production deployment supplies an adapter wrapping `soffice` /
  * Chromium / PDFBox on the executor image (reference `Dockerfile:3-6`).
  */
trait Converter extends Serializable {
  /** DOC/DOCX bytes → PDF bytes (reference `convert_doc_to_pdf`). */
  def docToPdf(content: Array[Byte]): Array[Byte]

  /** Load `url` in a browser and print to PDF; returns (pdf bytes,
    * detected content type if any) (reference
    * `capture_pdf_and_get_content_type_from_url`).
    */
  def capturePdfFromUrl(url: String): (Array[Byte], Option[String])

  /** Append a last-page watermark to a PDF (reference
    * `add_last_page_watermark`).
    */
  def addLastPageWatermark(pdf: Array[Byte], text: String): Array[Byte]
}

object Converter {
  /** Provenance watermark text (reference `generate_watermark_text`,
    * `pdf_conversion.py:109-122`): source URL + creation date. The
    * timestamp is a per-run constant passed down from the driver
    * (determinism under task retries — SURVEY.md §4.2).
    */
  def watermarkText(sourceUrl: String, runTs: Instant): String = {
    val date = DateTimeFormatter.ofPattern("d MMMM yyyy", Locale.ENGLISH)
      .withZone(ZoneOffset.UTC).format(runTs)
    s"Document downloaded from $sourceUrl\n\n" +
      s"This PDF was created by Climate Policy Radar on $date."
  }
}

/** Deterministic stand-in converter: produces valid-looking, stable PDF
  * bytes derived from the input so content hashes are reproducible.
  * Clearly a STUB — the real adapters shell out to soffice/Chromium.
  */
class StubConverter extends Converter {

  private def fakePdf(tag: String, payload: Array[Byte]): Array[Byte] = {
    val head = s"%PDF-1.4\n% graft-stub:$tag\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tail = "\n%%EOF\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    head ++ payload ++ tail
  }

  override def docToPdf(content: Array[Byte]): Array[Byte] =
    fakePdf("doc2pdf", content)

  // Real browser captures embed creation timestamps, so every capture is
  // byte-unique even for the same URL; a per-call UUID reproduces that
  // property GLOBALLY (a plain counter restarts in every deserialized
  // task copy and collides across partitions — the reference's
  // integration counts depend on uniqueness).
  override def capturePdfFromUrl(url: String): (Array[Byte], Option[String]) =
    (fakePdf(s"capture:${java.util.UUID.randomUUID()}",
      url.getBytes(java.nio.charset.StandardCharsets.UTF_8)), None)

  override def addLastPageWatermark(pdf: Array[Byte], text: String): Array[Byte] =
    pdf ++ s"\n% watermark: ${text.replace("\n", " ")}\n"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
}
