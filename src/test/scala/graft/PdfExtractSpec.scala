package graft

import graft.extract.PdfExtract
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Deterministic hand-built PDFs (no library): out-of-order blocks in the
  * content stream must come back in layout order (top-down, left-right) —
  * the observable contract of the reference's
  * `page.get_text("blocks", sort=True)` (`handlers/pdf.py:13-42`).
  */
class PdfExtractSpec extends AnyFunSuite {

  private def buildPdf(pagesContent: Seq[String], flate: Boolean = false): Array[Byte] = {
    val objs = scala.collection.mutable.ArrayBuffer.empty[String]
    val pageRefs = pagesContent.indices.map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    objs += s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj"
    objs += s"2 0 obj << /Type /Pages /Kids [ $pageRefs ] /Count ${pagesContent.length} >> endobj"
    objs += s"3 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj"
    pagesContent.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 4 + 2 * i
      val contentNum = pageNum + 1
      objs += s"$pageNum 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents $contentNum 0 R /Resources << /Font << /F1 3 0 R >> >> >> endobj"
      val payload =
        if (flate) {
          val d = new Deflater()
          d.setInput(content.getBytes(StandardCharsets.ISO_8859_1))
          d.finish()
          val out = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) out.write(buf, 0, d.deflate(buf))
          new String(out.toByteArray, StandardCharsets.ISO_8859_1)
        } else content
      val filter = if (flate) "/Filter /FlateDecode " else ""
      objs += s"$contentNum 0 obj << ${filter}/Length ${payload.length} >> " +
        s"stream\n$payload\nendstream endobj"
    }
    val body = "%PDF-1.4\n" + objs.mkString("\n") + "\ntrailer << /Root 1 0 R >>\n%%EOF"
    body.getBytes(StandardCharsets.ISO_8859_1)
  }

  test("blocks come back in layout order regardless of stream order") {
    // stream order: bottom block first, then top, then middle
    val content =
      """BT /F1 12 Tf 72 100 Td (bottom line) Tj ET
        |BT /F1 12 Tf 72 700 Td (top: ID A123456789) Tj ET
        |BT /F1 12 Tf 300 400 Td (right middle) Tj ET
        |BT /F1 12 Tf 72 400 Td (left middle) Tj ET""".stripMargin
    val text = PdfExtract.extractText(buildPdf(Seq(content)))
    assert(text ==
      "top: ID A123456789\nleft middle\nright middle\nbottom line")
  }

  test("multi-line blocks: Td/T* within BT join with newline") {
    val content =
      """BT /F1 12 Tf 14 TL 72 700 Td (first line) Tj T* (second line) Tj 0 -14 Td (third) Tj ET"""
    val text = PdfExtract.extractText(buildPdf(Seq(content)))
    assert(text == "first line\nsecond line\nthird")
  }

  test("TJ arrays, hex strings, escapes, Tm positioning") {
    val content =
      """BT /F1 12 Tf 1 0 0 1 72 700 Tm [(Hel)(lo) -250 (wor)(ld)] TJ ET
        |BT /F1 12 Tf 72 600 Td <41404243> Tj ET
        |BT /F1 12 Tf 72 500 Td (par\(en\) \\ and \101) Tj ET""".stripMargin
    // TJ strings concatenate; a large negative kerning adjustment (-250 >
    // half the space width) is an inter-word space, like MuPDF's extractor
    // (TeX encodes word gaps this way instead of space glyphs)
    val text = PdfExtract.extractText(buildPdf(Seq(content)))
    assert(text == "Hello world\nA@BC\npar(en) \\ and A")
  }

  test("FlateDecode streams and multiple pages") {
    val p1 = "BT /F1 12 Tf 72 700 Td (page one phone 0912-345-678) Tj ET"
    val p2 = "BT /F1 12 Tf 72 700 Td (page two email a@b.com) Tj ET"
    val text = PdfExtract.extractText(buildPdf(Seq(p1, p2), flate = true))
    assert(text == "page one phone 0912-345-678\npage two email a@b.com")
  }

  test("pdf text feeds the deid core end-to-end") {
    val pdf = buildPdf(Seq("BT /F1 12 Tf 72 700 Td (ID A123456789 ok) Tj ET"))
    val text = PdfExtract.extractText(pdf)
    val r = graft.pipeline.DeidCore.process(text)
    assert(r.entities.exists(_.typ == "ID"))
    assert(!r.text.contains("A123456789"))
  }
}
