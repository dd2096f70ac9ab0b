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

  // ---- LZWDecode (ISO 32000-1 §7.4.4) --------------------------------------

  /** Spec-faithful LZW encoder (test-side only): MSB-first variable-width
    * codes, clear at start and on table overflow, EarlyChange width bumps.
    */
  private def lzwEncode(data: Array[Byte], earlyChange: Int = 1,
      tableLimit: Int = 4096): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L; var nBits = 0; var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; nBits += width
      while (nBits >= 8) { out.write(((bitBuf >>> (nBits - 8)) & 0xff).toInt); nBits -= 8 }
    }
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    var nextCode = 258
    def reset(): Unit = {
      dict.clear(); (0 until 256).foreach(b => dict(Seq(b.toByte)) = b)
      nextCode = 258; width = 9
    }
    reset(); emit(256)
    var w = Seq.empty[Byte]
    data.foreach { b =>
      val wb = w :+ b
      if (dict.contains(wb)) w = wb
      else {
        emit(dict(w))
        if (nextCode < tableLimit) {
          dict(wb) = nextCode; nextCode += 1
          // decoder lags one entry; it widens when ITS table (nextCode - 1
          // entries) + earlyChange reaches 2^width, so the encoder widens
          // the next emitted code at the same stream position
          if (width < 12 && nextCode - 1 + earlyChange >= (1 << width)) width += 1
        } else { emit(256); reset() }
        w = Seq(b)
      }
    }
    if (w.nonEmpty) emit(dict(w))
    emit(257)
    if (nBits > 0) out.write(((bitBuf << (8 - nBits)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZW hand-derived vector: 'AAAAA' (exercises clear + KwKwK)") {
    // codes 256,65,258,258,257 @9 bits, MSB-first, zero-padded:
    val encoded = Array(0x80, 0x10, 0x60, 0x50, 0x28, 0x08).map(_.toByte)
    assert(new String(PdfExtract.lzw(encoded), StandardCharsets.ISO_8859_1) == "AAAAA")
  }

  test("LZW roundtrip across width bumps (9->10->11) and table resets") {
    // repetitive text drives the dictionary past 511 and 1023 entries
    val text = (1 to 400).map(i => s"line $i of the sample stream with id A12345678$i")
      .mkString("\n")
    val data = text.getBytes(StandardCharsets.ISO_8859_1)
    val once = PdfExtract.lzw(lzwEncode(data))
    assert(java.util.Arrays.equals(once, data), "width-bump roundtrip")
    // small table limit forces clear-table resets mid-stream (§7.4.4 reset)
    val reset = PdfExtract.lzw(lzwEncode(data, tableLimit = 400))
    assert(java.util.Arrays.equals(reset, data), "clear-table roundtrip")
    // EarlyChange=0 convention roundtrips when the decoder is told so
    val ec0 = PdfExtract.lzw(lzwEncode(data, earlyChange = 0), earlyChange = 0)
    assert(java.util.Arrays.equals(ec0, data), "EarlyChange=0 roundtrip")
  }

  test("LZWDecode content stream extracts through the full PDF path") {
    val content = "BT /F1 12 Tf 72 700 Td (lzw id A123456789 phone 0912-345-678) Tj ET"
    val payload = lzwEncode(content.getBytes(StandardCharsets.ISO_8859_1))
    val body = "%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [ 4 0 R ] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n" +
      "4 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 5 0 R /Resources << /Font << /F1 3 0 R >> >> >> endobj\n" +
      s"5 0 obj << /Filter /LZWDecode /Length ${payload.length} >> stream\n"
    val out = new ByteArrayOutputStream()
    out.write(body.getBytes(StandardCharsets.ISO_8859_1))
    out.write(payload)
    out.write("\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF"
      .getBytes(StandardCharsets.ISO_8859_1))
    val text = PdfExtract.extractText(out.toByteArray)
    assert(text == "lzw id A123456789 phone 0912-345-678", text)
  }

  test("LZW decoder tolerates garbage without throwing or hanging") {
    val rng = new java.util.Random(7)
    (1 to 50).foreach { _ =>
      val junk = new Array[Byte](1 + rng.nextInt(300))
      rng.nextBytes(junk)
      PdfExtract.lzw(junk) // must return, not throw
    }
    assert(PdfExtract.lzw(Array.empty[Byte]).isEmpty)
  }
}
