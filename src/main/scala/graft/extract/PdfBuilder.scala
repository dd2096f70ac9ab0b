package graft.extract

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Deterministic minimal PDF synthesis — the fixture/bench counterpart of
  * [[PdfExtract]] (no PDF library ships in this environment, and turns
  * carrying real PDF payloads only exist in production). One text block per
  * input line, laid out top-down from y=700 in 14pt steps.
  */
object PdfBuilder {

  def singlePage(text: String, flate: Boolean = true): Array[Byte] = {
    val lines = text.split("\n", -1).toSeq
    val content = lines.zipWithIndex.map { case (l, i) =>
      s"BT /F1 12 Tf 72 ${700 - 14 * i} Td (${escape(l)}) Tj ET"
    }.mkString("\n")
    build(Seq(content), flate)
  }

  /** Literal-string escaping for content streams (shared with the redaction
    * rebuilder).
    */
  def escapeText(s: String): String = escape(s)

  private def escape(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c if c < 256 => c.toString
      case _ => "?" // single-byte fonts only; non-latin goes through HTML/text paths
    }

  def build(pagesContent: Seq[String], flate: Boolean): Array[Byte] = {
    val objs = scala.collection.mutable.ArrayBuffer.empty[String]
    val pageRefs = pagesContent.indices.map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    objs += "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj"
    objs += s"2 0 obj << /Type /Pages /Kids [ $pageRefs ] /Count ${pagesContent.length} >> endobj"
    objs += "3 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj"
    pagesContent.zipWithIndex.foreach { case (content, i) =>
      val pageNum = 4 + 2 * i
      val contentNum = pageNum + 1
      objs += s"$pageNum 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents $contentNum 0 R /Resources << /Font << /F1 3 0 R >> >> >> endobj"
      val payload =
        if (flate) deflate(content.getBytes(StandardCharsets.ISO_8859_1))
        else content.getBytes(StandardCharsets.ISO_8859_1)
      val payloadStr = new String(payload, StandardCharsets.ISO_8859_1)
      val filter = if (flate) "/Filter /FlateDecode " else ""
      objs += s"$contentNum 0 obj << ${filter}/Length ${payload.length} >> " +
        s"stream\n$payloadStr\nendstream endobj"
    }
    ("%PDF-1.4\n" + objs.mkString("\n") + "\ntrailer << /Root 1 0 R >>\n%%EOF")
      .getBytes(StandardCharsets.ISO_8859_1)
  }

  // one native zlib stream per task thread, reset per call: a fresh
  // Deflater per row allocates (and, absent end(), finalizer-leaks) a
  // native stream — measurable at ~100k docs/task. reset() keeps the level
  // and strategy, so output bytes are identical to a fresh Deflater.
  private val deflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater()
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = deflater.get()
    d.reset()
    d.setInput(data)
    d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    out.toByteArray
  }
}
