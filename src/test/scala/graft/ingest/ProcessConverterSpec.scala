package graft.ingest

import java.nio.file.{Files, Paths}
import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

/** The [[ProcessConverter]] adapters. The external binaries (soffice,
  * chromium) are not installed in this container, so the process-backed
  * tests self-skip via `assume` — they run on an executor image built
  * like the reference's Dockerfile (libreoffice + browser). The watermark
  * path has no external dependency and always runs.
  */
class ProcessConverterSpec extends AnyFunSuite {

  private val fixtureDir =
    Paths.get("/root/reference/src/navigator_data_ingest/tests/fixtures")

  test("watermark path delegates to the real PdfWatermark appender") {
    val pdf = Files.readAllBytes(
      fixtureDir.resolve("sample-for-word-to-pdf-conversion.pdf"))
    val conv = new ProcessConverter()
    val text = Converter.watermarkText("https://example.com",
      Instant.parse("2023-01-01T00:00:00Z"))
    val out = conv.addLastPageWatermark(pdf, text)
    val doc = new PdfWatermark.Doc(out)
    assert(doc.pageLeafCount === new PdfWatermark.Doc(pdf).pageLeafCount + 1)
  }

  test("binary probe: available() is false for a nonexistent binary") {
    assert(!ProcessConverter.available("graft-no-such-binary-xyz"))
    // a binary every Linux image has
    assert(ProcessConverter.available("sh"))
  }

  test("soffice DOC -> PDF conversion (runs only where soffice exists)") {
    assume(ProcessConverter.available("soffice"), "soffice not installed")
    val doc = Files.readAllBytes(
      fixtureDir.resolve("sample-for-word-to-pdf-conversion.doc"))
    val pdf = new ProcessConverter().docToPdf(doc)
    assert(pdf.take(5).sameElements("%PDF-".getBytes))
    assert(new PdfWatermark.Doc(pdf).pageLeafCount > 0)
  }

  test("chromium URL capture (runs only where chromium exists)") {
    assume(ProcessConverter.available("chromium"), "chromium not installed")
    val f = Files.createTempFile("capture", ".html")
    Files.write(f, "<html><body>hello</body></html>".getBytes)
    val (pdf, ct) = new ProcessConverter().capturePdfFromUrl(s"file://$f")
    assert(pdf.take(5).sameElements("%PDF-".getBytes))
    assert(ct.isEmpty)
  }
}
