package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.extract.{PdfExtract, PdfFonts}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** S4 generalization — real-world PDF constructs beyond the synthetic
  * builder subset: classic xref + /Contents arrays, PDF 1.5 object streams,
  * filter chains, Type0/ToUnicode, /Differences encodings, TeX kern-encoded
  * spaces. Fixtures from `tools/gen_pdf_real.py` (expected text is
  * by-construction of the authored content streams), plus smoke checks on
  * genuine third-party PDFs when the host has them (TeX and DocBook
  * toolchain output — object streams, subset CM fonts, partial ToUnicode).
  */
class PdfRealSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pdf_real/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val expected: Map[String, String] = {
    val in = getClass.getResourceAsStream("/pdf_real/expected.json")
    require(in != null)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    root.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
  }

  for (name <- Seq("classic.pdf", "objstm.pdf", "filters.pdf",
      "type0.pdf", "type0_pii.pdf", "diffs.pdf", "kern.pdf")) {
    test(s"fixture $name extracts its authored text exactly") {
      assert(PdfExtract.extractText(fixture(name)) == expected(name))
    }
  }

  test("objstm fixture: two pages in TREE order (nested Kids), not file order") {
    val pages = PdfExtract.extractPages(fixture("objstm.pdf"))
    assert(pages.length == 2)
    assert(pages(0).text.contains("page ONE"))
    assert(pages(1).text.contains("page TWO"))
  }

  test("kern fixture: detection works on kern-spaced text (PII reachable)") {
    val text = PdfExtract.extractText(fixture("kern.pdf"))
    val ents = graft.pipeline.DeidCore.detect(text, "zh", withStub = false)
    assert(ents.exists(e => e.typ == "ID"), ents)
  }

  test("Type0 CID widths: /W list + range forms and /DW drive the block bbox") {
    val blocks = PdfExtract.extractBlocks(fixture("type0.pdf"))
    assert(blocks.length == 1)
    val b = blocks.head
    assert(b.text == "Hi 中文 ok")
    // widths: H=600 i=500 (list), sp=250 (range), 中文=1000,1000 (range),
    // sp=250, o=k=800 (DW); at 12pt from x=72:
    val want = 72 + (600 + 500 + 250 + 1000 + 1000 + 250 + 800 + 800) / 1000.0 * 12
    assert(math.abs(b.x1 - want) < 1e-6, s"x1=${b.x1} want=$want")
  }

  test("inline images (BI..ID binary EI) are skipped, surrounding text kept") {
    // binary payload contains bytes that would derail the lexer: parens,
    // brackets, a fake 'Tj', stray backslashes
    val content = "BT /F1 12 Tf 72 700 Td (before) Tj ET\n" +
      "BI /W 4 /H 2 /BPC 8 /CS /RGB ID \u0001(\u0002)[\u0003]\\ (fake) Tj \u00ff EI\n" +
      "BT /F1 12 Tf 72 680 Td (after) Tj ET"
    val pdf = buildRaw(content)
    assert(PdfExtract.extractText(pdf) == "before\nafter")
  }

  private def buildRaw(content: String): Array[Byte] = {
    val objs = Seq(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
      s"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj")
    ("%PDF-1.4\n" + objs.mkString("\n") + "\ntrailer << /Root 1 0 R >>")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  test("ToUnicode CMap parser: bfchar, bfrange increment + array dst") {
    val cmap =
      """2 beginbfchar
        |<01> <0041>
        |<02> <00660066>
        |endbfchar
        |2 beginbfrange
        |<10> <12> <0061>
        |<20> <21> [<005A> <0079>]
        |endbfrange""".stripMargin
    val m = PdfFonts.parseToUnicode(cmap)
    assert(m(1) == "A" && m(2) == "ff")
    assert(m(0x10) == "a" && m(0x11) == "b" && m(0x12) == "c")
    assert(m(0x20) == "Z" && m(0x21) == "y")
  }

  test("OT1 builtin: CM text font dashes/quotes/ligatures decode") {
    val f = PdfFonts.Font("ABCDEF+CMR10", twoByte = false, Map.empty,
      Map.empty, "OT1", Map.empty, 500, 333)
    assert(f.decode("{|") == "–—")
    assert(f.decode("\u000b\u000c\r") == "ﬀﬁﬂ") // OT1 ligature slots
    assert(f.decode("`'") == "‘’")
    assert(f.decode("plain ascii 123") == "plain ascii 123")
  }

  // ---- genuine third-party PDFs (host-dependent smoke checks) -------------

  private def hostPdf(path: String): Option[Array[Byte]] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isReadable(p)) Some(java.nio.file.Files.readAllBytes(p))
    else None
  }

  test("real TeX PDF (object streams, CM subset fonts) extracts readable text") {
    hostPdf("/usr/share/doc/libtasn1-doc/libtasn1.pdf") match {
      case None => cancel("host PDF not present")
      case Some(bytes) =>
        val pages = PdfExtract.extractPages(bytes)
        assert(pages.length == 36, s"got ${pages.length} pages")
        assert(pages.count(_.needsOcr) == 0)
        val p0 = pages.head.text
        assert(p0.contains("Libtasn1"))
        assert(p0.contains("help-libtasn1@gnu.org")) // email survives = PII reachable
        // ToUnicode endash + kern-space words on a content page
        assert(pages(1).text.contains("2001–2022 Free Software Foundation"))
    }
  }

  test("real DocBook PDF extracts page-ordered readable text") {
    hostPdf("/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf") match {
      case None => cancel("host PDF not present")
      case Some(bytes) =>
        val pages = PdfExtract.extractPages(bytes)
        assert(pages.length == 17, s"got ${pages.length} pages")
        assert(pages.head.text.contains("Shared MIME-info Database"))
        assert(pages.head.text.contains("1. Introduction"))
    }
  }
}
