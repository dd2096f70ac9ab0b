package graft

import graft.extract.{PdfBuilder, PdfExtract, XlsxBuilder, XlsxExtract}
import graft.sources.FormatJobs
import org.scalatest.funsuite.AnyFunSuite

/** K2 CSV sink + S9 XLSX + S5 OCR trigger.
  *
  * CSV goldens are byte outputs of RUNNING the reference
  * (`DeidPipeline(language="zh").process(csv, output_mode="replace",
  * output_dir=...)` over `handlers/csv.py:53-93`) in its golden environment
  * (USE_STUB=true, faker absent) — same protocol as tools/gen_*.py.
  */
class FormatJobsSpec extends AnyFunSuite {

  test("CSV rewrite matches the reference's rebuilt file byte-for-byte") {
    // reference: tests/test_csv_handler.py input; golden captured 2026-08-16
    val (out, n) = FormatJobs.rewriteCsvText("id,phone\nA123456789,0912345678\n")
    assert(out == "id,phone\r\nY237501685,0935267744\r\n", out)
    assert(n == 2)
  }

  test("CSV rewrite: quoted multi-row golden (quote preserved, first-occurrence)") {
    val (out, _) = FormatJobs.rewriteCsvText(
      "name,note\nAlice,\"call 0912-345-678, ok\"\nBob,nothing\n")
    assert(out == "name,note\r\nAlice,\"call 0994055778, ok\"\r\nBob,nothing\r\n", out)
  }

  test("CSV rewrite e2e contract: original absent, replacement present, rest intact") {
    val (out, n) = FormatJobs.rewriteCsvText("id,phone\nA123456789,0912345678\n")
    assert(!out.contains("A123456789") && !out.contains("0912345678"))
    assert(out.startsWith("id,phone\r\n"))
    assert(n == 2)
  }

  test("XLSX extract: sheet order, row-major cells, A1 anchors, non-empty only") {
    val wb = XlsxBuilder.build(Seq(
      "S1" -> Seq(
        XlsxExtract.Cell("S1", 1, 1, "A1", "id"),
        XlsxExtract.Cell("S1", 1, 2, "B1", "phone"),
        XlsxExtract.Cell("S1", 2, 1, "A2", "A123456789"),
        XlsxExtract.Cell("S1", 2, 2, "B2", "0912345678")),
      "S2" -> Seq(XlsxExtract.Cell("S2", 1, 1, "A1", "note & <ok>"))))
    val doc = XlsxExtract.extract(wb)
    // one segment per non-empty cell, "\n" separator (handlers/xlsx.py:21-51)
    assert(doc.text == "id\nphone\nA123456789\n0912345678\nnote & <ok>")
    val anchors = doc.segments.map(_.cell.get)
    assert(anchors(2) == Map("sheet" -> "S1", "address" -> "A2", "row" -> "2", "col" -> "1"))
    assert(anchors(4)("sheet") == "S2")
  }

  test("XLSX rewrite roundtrip: PII cell rewritten, other cells byte-identical") {
    val wb = XlsxBuilder.build(Seq("Sheet1" -> Seq(
      XlsxExtract.Cell("Sheet1", 1, 1, "A1", "id"),
      XlsxExtract.Cell("Sheet1", 1, 2, "B1", "A123456789"),
      XlsxExtract.Cell("Sheet1", 2, 1, "A2", "plain text"))))
    val (out, n) = FormatJobs.rewriteXlsx(wb)
    val cells = XlsxExtract.cells(out).map(c => (c.address, c.text))
    assert(n == 1)
    assert(cells.contains(("A1", "id")) && cells.contains(("A2", "plain text")))
    val b1 = cells.find(_._1 == "B1").get._2
    assert(b1 != "A123456789" && b1.matches("[A-Z]\\d{9}"), b1)
  }

  test("XLSX same doc text as CSV of the same cells ⇒ same replacements") {
    // the two handlers build the identical "\n"-joined document, so the
    // context-hash-seeded replacement must agree across formats
    val wb = XlsxBuilder.build(Seq("x" -> Seq(
      XlsxExtract.Cell("x", 1, 1, "A1", "id"),
      XlsxExtract.Cell("x", 2, 1, "A2", "phone"),
      XlsxExtract.Cell("x", 3, 1, "A3", "A123456789"),
      XlsxExtract.Cell("x", 4, 1, "A4", "0912345678"))))
    val (xlsxOut, _) = FormatJobs.rewriteXlsx(wb)
    val got = XlsxExtract.cells(xlsxOut).map(_.text)
    assert(got == Seq("id", "phone", "Y237501685", "0935267744"), got)
  }

  test("DOCX extract: paragraph per segment, empties kept, tab/br decoded") {
    val docx = graft.extract.DocxBuilder.build(Seq("id\tA123456789", "", "line1\nline2"))
    val doc = graft.extract.DocxExtract.extract(docx)
    // python-docx doc.paragraphs keeps empty paragraphs (docx.py:23-25)
    assert(doc.text == "id\tA123456789\n\nline1\nline2")
    assert(doc.segments.length == 3)
  }

  test("DOCX rewrite: replace-all per paragraph, same replacements as CSV twin") {
    // the "\n"-joined doc text equals the CSV golden's, so the context-hash
    // seeded replacements must agree with the byte golden above
    val docx = graft.extract.DocxBuilder.build(Seq("id", "phone", "A123456789", "0912345678"))
    val (out, n) = FormatJobs.rewriteDocx(docx)
    assert(n == 2)
    assert(graft.extract.DocxExtract.paragraphs(out)
      == Seq("id", "phone", "Y237501685", "0935267744"))
  }

  test("PPTX extract: shape per segment, stripped, empties skipped") {
    val pptx = graft.extract.PptxBuilder.build(Seq(
      (0, "  title with spaces  "), (0, "A123456789"), (1, "slide two")))
    val doc = graft.extract.PptxExtract.extract(pptx)
    assert(doc.text == "title with spaces\nA123456789\nslide two")
  }

  test("PPTX rewrite: PII gone, other shapes intact") {
    val pptx = graft.extract.PptxBuilder.build(Seq((0, "contact"), (0, "0912345678")))
    val (out, n) = FormatJobs.rewritePptx(pptx)
    val texts = graft.extract.PptxExtract.shapeTexts(out).map(_._2)
    assert(n == 1)
    assert(texts.head == "contact")
    assert(texts(1) != "0912345678" && texts(1).matches("09\\d{8}"), texts)
  }

  test("colIndex/colLetters are inverse (A..ZZ)") {
    (1 to 702).foreach { i =>
      assert(XlsxExtract.colIndex(XlsxExtract.colLetters(i)) == i)
    }
    assert(XlsxExtract.colIndex("A") == 1 && XlsxExtract.colIndex("AA") == 27)
  }

  test("F6 filename templating: {stem}.deid{ext}, pathlib dot semantics") {
    assert(FormatJobs.deidFileName("sample.csv") == "sample.deid.csv")
    assert(FormatJobs.deidFileName("/a/b/report.final.pdf") == "report.final.deid.pdf")
    assert(FormatJobs.deidFileName("noext") == "noext.deid")
    assert(FormatJobs.deidFileName(".env") == ".env.deid") // Path(".env").suffix == ""
  }

  test("A2 rect resolution: search hits intersecting the block, then fallbacks") {
    import graft.extract.{PdfExtract, PdfRedact}
    val blocks = Seq(
      PdfExtract.Block(0, 72, 700, "id A123456789 here"),
      PdfExtract.Block(0, 72, 686, "other line"))
    val br = PdfRedact.blockRect(blocks.head)
    // direct hit: needle at char offset 3, width 10 chars
    val direct = PdfRedact.resolveForEntity(blocks, "A123456789", br, 0)
    assert(direct.length == 1 && direct.head.strategy == "search_for")
    assert(math.abs(direct.head.x0 - (72 + 3 * PdfRedact.charW)) < 1e-9)
    assert(math.abs(direct.head.x1 - (72 + 13 * PdfRedact.charW)) < 1e-9)
    // whitespace-normalized fallback (pdf.py:110-117): doubled space inside
    val fuzzy = PdfRedact.resolveForEntity(blocks, "id  A123456789", br, 0)
    assert(fuzzy.nonEmpty && fuzzy.head.strategy == "search_for")
    // block-bbox fallback when nothing matches (pdf.py:119-120)
    val fb = PdfRedact.resolveForEntity(blocks, "absent needle", br, 0)
    assert(fb == Seq(PdfRedact.Rect(0, br._1, br._2, br._3, br._4, "block_bbox")))
  }

  test("A2 rects use code-point glyph cells with supplementary-plane prefix") {
    import graft.extract.{PdfExtract, PdfRedact}
    // "😀😀" = 2 code points but 4 UTF-16 chars before the needle
    val blocks = Seq(PdfExtract.Block(0, 72, 700, "😀😀 A123456789"))
    val hit = PdfRedact.searchFor(blocks, "A123456789")
    assert(hit.length == 1)
    // needle sits at code-point offset 3 (two emoji + space), width 10 cells
    assert(math.abs(hit.head.x0 - (72 + 3 * PdfRedact.charW)) < 1e-9, hit)
    assert(math.abs(hit.head.x1 - (72 + 13 * PdfRedact.charW)) < 1e-9, hit)
    // rebuild drops exactly the covered glyph cells, not UTF-16-shifted ones
    val rebuilt = PdfRedact.rebuild(Seq(0 -> blocks), hit)
    val text = PdfExtract.extractText(rebuilt)
    assert(!text.contains("A123456789"), text)
  }

  test("K3 black-box rebuild: redacted PDF no longer contains the PII text") {
    import graft.extract.{PdfBuilder, PdfExtract, PdfRedact}
    val pdf = PdfBuilder.singlePage("id A123456789 here\ncall 0912-345-678 now\nplain line")
    val (out, rects) = PdfRedact.redact(pdf)
    assert(rects.nonEmpty && rects.forall(_.strategy == "search_for"))
    val text = PdfExtract.extractText(out)
    assert(!text.contains("A123456789") && !text.contains("0912-345-678"), text)
    assert(text.contains("plain line")) // untouched content survives
    assert(text.contains("here") && text.contains("now")) // same-line words kept
    // black fills present in the rebuilt content
    assert(PdfExtract.extractBlocks(out).nonEmpty)
  }

  test("S5 OCR trigger: page text under 50 chars flags needs_ocr") {
    val short = PdfBuilder.singlePage("tiny scanned page")
    val long = PdfBuilder.singlePage("x" * 60)
    val ps = PdfExtract.extractPages(short)
    val pl = PdfExtract.extractPages(long)
    assert(ps.length == 1 && ps.head.needsOcr, ps)
    assert(pl.length == 1 && !pl.head.needsOcr, pl)
    // exact threshold semantics: len < 50 (config.py:96), not <=
    assert(PdfExtract.extractPages(PdfBuilder.singlePage("y" * 49)).head.needsOcr)
    assert(!PdfExtract.extractPages(PdfBuilder.singlePage("y" * 50)).head.needsOcr)
  }
}
