package graft.extract

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** Layout-ordered PDF text extraction, from scratch (S4; north rule).
  *
  * The reference uses PyMuPDF `page.get_text("blocks", sort=True)`: text
  * blocks with their bboxes, sorted top-down then left-right, text-typed
  * blocks only, block texts stripped and joined by "\n"
  * (`/root/reference/src/deid_pipeline/handlers/pdf.py:13-42`). This
  * extractor replicates that *contract* on a deliberately small PDF subset:
  *
  *  - cross-reference-free object scan (`N 0 obj … endobj`);
  *  - page objects in file order; `/Contents N 0 R` single stream per page;
  *  - content streams raw or `/FlateDecode`;
  *  - text operators: BT/ET, Td, TD, T*, TL, Tm, Tj, TJ, ' (quote);
  *  - literal `(…)` strings with escapes + octal, and hex `<…>` strings,
  *    single-byte encodings only (no CID/Type0 font decoding).
  *
  * Block model: one block per BT…ET; within a block each Td/TD/T-star/Tm
  * starts a new line; lines join with "\n". Blocks sort by (top DESC in PDF user
  * space = top-down on the page, then x ASC), ties by emission order.
  *
  * Good enough for machine-generated single-column PDFs (the fixture class
  * the reference tests with); scanned/CID PDFs are out of v1 scope
  * (SURVEY §7.6).
  */
object PdfExtract {

  final case class Block(page: Int, x: Double, y: Double, text: String)

  /** One extracted page: layout-ordered text plus the S5 OCR-fallback
    * trigger flag (`parser/text_extractor.py:155`): a page whose extracted
    * text is shorter than `OCR_THRESHOLD` (50 chars, `config.py:96`) is a
    * scanned/empty page the reference would rasterize + OCR. The OCR itself
    * is out of scope (no engine in this sandbox); the trigger RULE is kept
    * as a flag column so behavior parity is testable.
    */
  final case class Page(page: Int, text: String, needsOcr: Boolean)

  /** `OCR_THRESHOLD` (`config.py:96`). */
  val ocrThreshold = 50

  /** Full extracted text: blocks in layout order joined by "\n", pages
    * concatenated in order, empty pages skipped (the reference joins
    * non-empty page texts by "\n", `handlers/pdf.py:36-41`).
    */
  def extractText(pdf: Array[Byte]): String =
    extractPages(pdf).map(_.text).filter(_.nonEmpty).mkString("\n")

  /** Per-page extraction with the OCR trigger flag. Pages with no content
    * stream / no text blocks yield text "" and needsOcr=true — the
    * scanned-page case the rule exists for.
    */
  def extractPages(pdf: Array[Byte], threshold: Int = ocrThreshold): Seq[Page] =
    pageBlocks(pdf).map { case (pageIdx, bs) =>
      val text = bs.map(_.text.trim).filter(_.nonEmpty).mkString("\n")
      Page(pageIdx, text, text.codePointCount(0, text.length) < threshold)
    }

  /** Layout-ordered blocks across pages. */
  def extractBlocks(pdf: Array[Byte]): Seq[Block] = pageBlocks(pdf).flatMap(_._2)

  /** (pageIdx, layout-ordered blocks) for every page object, including pages
    * that resolve to no text blocks.
    */
  def pageBlocks(pdf: Array[Byte]): Seq[(Int, Seq[Block])] = {
    val raw = new String(pdf, StandardCharsets.ISO_8859_1)
    val objects = scanObjects(raw)
    val pages = pageContentRefs(raw)
    pages.zipWithIndex.map { case (contentObj, pageIdx) =>
      pageIdx -> objects.get(contentObj).toSeq.flatMap { objBody =>
        streamBytes(objBody).toSeq.flatMap { bytes =>
          val content = new String(bytes, StandardCharsets.ISO_8859_1)
          val blocks = interpret(content, pageIdx)
          blocks.sortBy(b => (-b.y, b.x))
        }
      }
    }
  }

  /** obj number → body text (between `obj` and `endobj`). */
  private def scanObjects(raw: String): Map[Int, String] = {
    val re = java.util.regex.Pattern.compile("(\\d+)\\s+0\\s+obj", java.util.regex.Pattern.DOTALL)
    val m = re.matcher(raw)
    val out = Map.newBuilder[Int, String]
    while (m.find()) {
      val end = raw.indexOf("endobj", m.end)
      if (end > 0) out += m.group(1).toInt -> raw.substring(m.end, end)
    }
    out.result()
  }

  /** /Type /Page objects in file order → their /Contents object number. */
  private def pageContentRefs(raw: String): Seq[Int] = {
    val pageRe = java.util.regex.Pattern.compile(
      "\\d+\\s+0\\s+obj(.*?)endobj", java.util.regex.Pattern.DOTALL)
    val contentsRe = java.util.regex.Pattern.compile("/Contents\\s+(\\d+)\\s+0\\s+R")
    val m = pageRe.matcher(raw)
    val out = Seq.newBuilder[Int]
    while (m.find()) {
      val body = m.group(1)
      if (body.contains("/Type /Page") && !body.contains("/Type /Pages")) {
        val c = contentsRe.matcher(body)
        if (c.find()) out += c.group(1).toInt
      }
    }
    out.result()
  }

  /** Stream payload of an object body, inflated when /FlateDecode. */
  private def streamBytes(objBody: String): Option[Array[Byte]] = {
    val si = objBody.indexOf("stream")
    if (si < 0) return None
    var start = si + "stream".length
    if (start < objBody.length && objBody.charAt(start) == '\r') start += 1
    if (start < objBody.length && objBody.charAt(start) == '\n') start += 1
    val end = objBody.indexOf("endstream", start)
    if (end < 0) return None
    val data = objBody.substring(start, end).stripSuffix("\n").stripSuffix("\r")
      .getBytes(StandardCharsets.ISO_8859_1)
    if (objBody.substring(0, si).contains("/FlateDecode")) Some(inflate(data))
    else Some(data)
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n) else if (n == 0 && inf.needsDictionary()) return out.toByteArray
    }
    inf.end()
    out.toByteArray
  }

  /** Tiny content-stream interpreter for the text operators. */
  private def interpret(content: String, page: Int): Seq[Block] = {
    val toks = tokenize(content)
    val blocks = ArrayBuffer.empty[Block]
    var i = 0
    var inText = false
    var x = 0.0
    var y = 0.0
    var leading = 0.0
    var blockX = 0.0
    var blockY = 0.0
    var lines = ArrayBuffer.empty[String]
    var line = new java.lang.StringBuilder
    val operands = ArrayBuffer.empty[Token]

    def newLine(): Unit = {
      if (line.length > 0 || lines.nonEmpty) { lines += line.toString; line = new java.lang.StringBuilder }
    }
    def flushBlock(): Unit = {
      newLine()
      val text = lines.filter(_.nonEmpty).mkString("\n")
      if (text.trim.nonEmpty) blocks += Block(page, blockX, blockY, text)
      lines = ArrayBuffer.empty[String]
      line = new java.lang.StringBuilder
    }
    def num(t: Token): Double = t match {
      case NumTok(v) => v
      case _ => 0.0
    }

    while (i < toks.length) {
      toks(i) match {
        case OpTok(op) =>
          op match {
            case "BT" =>
              inText = true; x = 0; y = 0; blockX = 0; blockY = 0
            case "ET" =>
              if (inText) flushBlock(); inText = false
            case "Td" if operands.length >= 2 =>
              x += num(operands(operands.length - 2)); y += num(operands.last)
              if (lines.isEmpty && line.length == 0) { blockX = x; blockY = y }
              else newLine()
            case "TD" if operands.length >= 2 =>
              leading = -num(operands.last)
              x += num(operands(operands.length - 2)); y += num(operands.last)
              if (lines.isEmpty && line.length == 0) { blockX = x; blockY = y }
              else newLine()
            case "TL" if operands.nonEmpty =>
              leading = num(operands.last)
            case "T*" =>
              y -= leading
              newLine()
            case "Tm" if operands.length >= 6 =>
              x = num(operands(operands.length - 2)); y = num(operands.last)
              if (lines.isEmpty && line.length == 0) { blockX = x; blockY = y }
              else newLine()
            case "Tj" | "'" =>
              if (op == "'") { y -= leading; newLine() }
              operands.lastOption.foreach {
                case StrTok(s) => line.append(s)
                case _ => ()
              }
            case "TJ" =>
              operands.foreach {
                case StrTok(s) => line.append(s)
                case _ => ()
              }
            case _ => ()
          }
          operands.clear()
        case t => operands += t
      }
      i += 1
    }
    if (inText) flushBlock()
    blocks.toSeq
  }

  private sealed trait Token
  private final case class NumTok(v: Double) extends Token
  private final case class StrTok(s: String) extends Token
  private final case class OpTok(op: String) extends Token
  private case object OtherTok extends Token

  private def tokenize(s: String): IndexedSeq[Token] = {
    val out = ArrayBuffer.empty[Token]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') {
        val sb = new java.lang.StringBuilder
        var depth = 1
        i += 1
        while (i < n && depth > 0) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            s.charAt(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case '(' => sb.append('('); i += 2
              case ')' => sb.append(')'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case d if d >= '0' && d <= '7' =>
                var j = i + 1
                var v = 0
                while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                  v = v * 8 + (s.charAt(j) - '0'); j += 1
                }
                sb.append(v.toChar); i = j
              case other => sb.append(other); i += 2
            }
          } else {
            if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            if (depth > 0) sb.append(ch)
            i += 1
          }
        }
        out += StrTok(sb.toString)
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
        val end = s.indexOf('>', i + 1)
        val hex = s.substring(i + 1, if (end < 0) n else end).replaceAll("\\s", "")
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j + 1 < hex.length + 1 && j < hex.length) {
          val pair = if (j + 1 < hex.length) hex.substring(j, j + 2) else hex.substring(j) + "0"
          sb.append(Integer.parseInt(pair, 16).toChar)
          j += 2
        }
        out += StrTok(sb.toString)
        i = if (end < 0) n else end + 1
      } else if (c == '<' || c == '>') {
        i += 2 // dict delimiters << >>
        out += OtherTok
      } else if (c == '[' || c == ']') {
        i += 1 // TJ arrays: flatten — strings accumulate, numbers ignored
      } else if (c == '/' ) {
        var j = i + 1
        while (j < n && !s.charAt(j).isWhitespace && !"()<>[]/".contains(s.charAt(j))) j += 1
        out += OtherTok
        i = j
      } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
        var j = i + 1
        while (j < n && (s.charAt(j).isDigit || s.charAt(j) == '.')) j += 1
        out += NumTok(s.substring(i, j).toDouble)
        i = j
      } else {
        var j = i
        while (j < n && !s.charAt(j).isWhitespace && !"()<>[]/".contains(s.charAt(j))) j += 1
        val op = s.substring(i, j)
        out += OpTok(op)
        i = math.max(j, i + 1)
      }
    }
    out.toIndexedSeq
  }
}
