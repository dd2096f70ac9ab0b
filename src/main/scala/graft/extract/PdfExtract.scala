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
  * extractor replicates that *contract* over the PDF constructs that
  * machine-generated documents (TeX, browsers, office exporters, report
  * generators) actually emit:
  *
  *  - classic AND cross-reference-stream files: objects are found by a
  *    full-file scan (`N G obj … endobj`, /Length-aware so binary streams
  *    can't fake an `endobj`), then `/Type /ObjStm` object streams are
  *    expanded — no xref table needed, which also makes the parser robust
  *    to the truncated/append-updated files real corpora contain;
  *  - page ORDER from the catalog's /Pages tree (/Kids, nested), falling
  *    back to file order when no catalog resolves;
  *  - `/Contents` as a single ref or an array of refs (streams concatenated
  *    in order, as the spec requires);
  *  - stream filters: /FlateDecode (with PNG predictors), /ASCIIHexDecode,
  *    /ASCII85Decode, /LZWDecode (ISO 32000-1 §7.4.4: variable 9–12-bit
  *    codes, clear-table resets, EarlyChange), and chains thereof;
  *  - text operators: BT/ET, Td, TD, T*, TL, Tm, Tj, TJ, ', ", Tf;
  *  - per-font decoding via /ToUnicode CMaps, /Encoding /Differences with
  *    AGL glyph names, /WinAnsiEncoding//MacRomanEncoding, Type0 2-byte
  *    codes ([[PdfFonts]]); glyph advances from /Widths or standard-14
  *    metrics drive block bboxes and the TJ kerning-gap space heuristic
  *    (TeX encodes inter-word spaces as negative TJ offsets, not space
  *    glyphs).
  *
  * Block model: one block per BT…ET; within a block each Td/TD/T-star/Tm
  * starts a new line; lines join with "\n". Blocks sort by (top DESC in PDF
  * user space = top-down on the page, then x ASC), ties by emission order.
  *
  * Scanned (image-only) and CID-without-ToUnicode PDFs degrade to the S5
  * OCR-fallback flag rather than text (SURVEY §7.6).
  */
object PdfExtract {

  final case class Block(page: Int, x: Double, y: Double, text: String, x1: Double = 0.0)

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

  // ---- object layer --------------------------------------------------------

  private[extract] final case class PdfObj(dict: String, stream: Option[Array[Byte]])

  /** (pageIdx, layout-ordered blocks) for every page, including pages that
    * resolve to no text blocks.
    */
  def pageBlocks(pdf: Array[Byte]): Seq[(Int, Seq[Block])] = {
    val raw = new String(pdf, StandardCharsets.ISO_8859_1)
    val objects = expandObjStms(scanObjects(raw))
    val pages = pageObjects(objects)
    pages.zipWithIndex.map { case ((_, pageDict), pageIdx) =>
      val fonts = pageFonts(pageDict, objects)
      val content = contentStreams(pageDict, objects)
        .map(b => new String(b, StandardCharsets.ISO_8859_1))
        .mkString("\n")
      pageIdx -> interpret(content, pageIdx, fonts).sortBy(b => (-b.y, b.x))
    }
  }

  /** obj number → (dict text, raw stream bytes). /Length-aware: a literal
    * /Length slices the stream exactly so binary payloads containing
    * `endobj`/`endstream` bytes can't derail the scan; indirect /Length
    * falls back to the `endstream` search.
    */
  private[extract] def scanObjects(raw: String): Map[Int, PdfObj] = {
    val re = java.util.regex.Pattern.compile("(\\d+)\\s+(\\d+)\\s+obj\\b")
    val lenRe = java.util.regex.Pattern.compile("/Length\\s+(\\d+)(?!\\s+\\d+\\s+R)")
    val m = re.matcher(raw)
    val out = Map.newBuilder[Int, PdfObj]
    var searchFrom = 0
    while (m.find(searchFrom)) {
      val num = m.group(1).toInt
      val bodyStart = m.end
      val streamKw = raw.indexOf("stream", bodyStart)
      val endobjKw = raw.indexOf("endobj", bodyStart)
      if (endobjKw < 0) {
        // truncated file: keep what we have
        searchFrom = raw.length
      } else if (streamKw >= 0 && streamKw < endobjKw) {
        val dict = raw.substring(bodyStart, streamKw)
        var s = streamKw + "stream".length
        if (s < raw.length && raw.charAt(s) == '\r') s += 1
        if (s < raw.length && raw.charAt(s) == '\n') s += 1
        val lm = lenRe.matcher(dict)
        val end =
          if (lm.find()) math.min(s + lm.group(1).toLong, raw.length.toLong).toInt
          else {
            val e = raw.indexOf("endstream", s)
            if (e < 0) raw.length else stripEol(raw, s, e)
          }
        val bytes = raw.substring(s, end).getBytes(StandardCharsets.ISO_8859_1)
        out += num -> PdfObj(dict, Some(bytes))
        val after = raw.indexOf("endobj", end)
        searchFrom = if (after < 0) raw.length else after + 6
      } else {
        out += num -> PdfObj(raw.substring(bodyStart, endobjKw), None)
        searchFrom = endobjKw + 6
      }
    }
    out.result()
  }

  private def stripEol(raw: String, start: Int, end: Int): Int = {
    var e = end
    if (e > start && raw.charAt(e - 1) == '\n') e -= 1
    if (e > start && raw.charAt(e - 1) == '\r') e -= 1
    e
  }

  /** Expand `/Type /ObjStm` compressed object streams into the map (this is
    * how PDF 1.5+ files store their page/font dictionaries; walking ObjStms
    * directly sidesteps xref-stream parsing entirely).
    */
  private[extract] def expandObjStms(objects: Map[Int, PdfObj]): Map[Int, PdfObj] = {
    val extra = Map.newBuilder[Int, PdfObj]
    objects.valuesIterator.foreach { obj =>
      if (obj.dict.contains("/ObjStm") && obj.stream.isDefined) {
        decodeStream(obj).foreach { payload =>
          val text = new String(payload, StandardCharsets.ISO_8859_1)
          (intAfter(obj.dict, "/N"), intAfter(obj.dict, "/First")) match {
            case (Some(n), Some(first)) =>
              val header = text.substring(0, math.min(first, text.length))
              val nums = "\\d+".r.findAllIn(header).map(_.toInt).toArray
              var i = 0
              while (i + 1 < nums.length && i / 2 < n) {
                val objNum = nums(i)
                val off = first + nums(i + 1)
                val end =
                  if (i + 3 < nums.length && (i + 2) / 2 < n) first + nums(i + 3)
                  else text.length
                if (off <= text.length)
                  extra += objNum -> PdfObj(
                    text.substring(off, math.min(end, text.length)), None)
                i += 2
              }
            case _ => ()
          }
        }
      }
    }
    // in-file objects win over ObjStm copies (appended incremental updates)
    extra.result() ++ objects
  }

  private def intAfter(dict: String, key: String): Option[Int] = {
    val m = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(key) + "\\s+(\\d+)").matcher(dict)
    if (m.find()) Some(m.group(1).toInt) else None
  }

  private[extract] def refAfter(dict: String, key: String): Option[Int] = {
    val m = java.util.regex.Pattern.compile(
      java.util.regex.Pattern.quote(key) + "\\s+(\\d+)\\s+\\d+\\s+R").matcher(dict)
    if (m.find()) Some(m.group(1).toInt) else None
  }

  // ---- filters -------------------------------------------------------------

  /** Apply the object's filter chain to its raw stream. */
  private[extract] def decodeStream(obj: PdfObj): Option[Array[Byte]] =
    obj.stream.map { data =>
      filterNames(obj.dict).foldLeft(data) { (d, f) =>
        f match {
          case "FlateDecode" => predictor(obj.dict, inflate(d))
          case "ASCIIHexDecode" => asciiHex(d)
          case "ASCII85Decode" => ascii85(d)
          case "LZWDecode" =>
            predictor(obj.dict, lzw(d, intAfter(obj.dict, "/EarlyChange").getOrElse(1)))
          case _ => d // unknown (DCT, JBIG2…): pass through, caller sees garbage → no text
        }
      }
    }

  private def filterNames(dict: String): Seq[String] = {
    val m = java.util.regex.Pattern
      .compile("/Filter\\s*(\\[[^\\]]*\\]|/\\w+)").matcher(dict)
    if (!m.find()) Nil
    else "/(\\w+)".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq
  }

  // one native zlib stream per task thread, reset per call (the
  // PdfBuilder.deflate discipline): a fresh Inflater per stream allocates a
  // native zlib state per row — and the early-return path never end()ed it
  private val inflater = new ThreadLocal[Inflater] {
    override def initialValue(): Inflater = new Inflater()
  }

  private[extract] def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = inflater.get()
    inf.reset()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && inf.needsDictionary()) return out.toByteArray
      }
    } catch { case _: java.util.zip.DataFormatException => () } // partial OK
    out.toByteArray
  }

  /** PNG predictors (/DecodeParms /Predictor >= 10) — TeX/ghostscript apply
    * them to ObjStm payloads occasionally; cheap to undo.
    */
  private def predictor(dict: String, data: Array[Byte]): Array[Byte] = {
    val pred = intAfter(dict, "/Predictor").getOrElse(1)
    if (pred < 10) return data
    val columns = intAfter(dict, "/Columns").getOrElse(1)
    val colors = intAfter(dict, "/Colors").getOrElse(1)
    val bpc = intAfter(dict, "/BitsPerComponent").getOrElse(8)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = columns * bpp
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    var r = 0
    while (r < rows) {
      val ft = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val rawB = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
        val ul = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => rawB
          case 1 => rawB + left
          case 2 => rawB + up
          case 3 => rawB + (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            rawB + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => rawB
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private def asciiHex(data: Array[Byte]): Array[Byte] = {
    val s = new String(data, StandardCharsets.ISO_8859_1)
      .takeWhile(_ != '>').filter(c => !c.isWhitespace)
    val padded = if (s.length % 2 == 1) s + "0" else s
    padded.grouped(2).map(p => Integer.parseInt(p, 16).toByte).toArray
  }

  private def ascii85(data: Array[Byte]): Array[Byte] = {
    val s = new String(data, StandardCharsets.ISO_8859_1)
    val end = s.indexOf("~>")
    val src = (if (end >= 0) s.substring(0, end) else s).filter(c => !c.isWhitespace)
    val out = new java.io.ByteArrayOutputStream(src.length * 4 / 5 + 4)
    var i = 0
    while (i < src.length) {
      if (src.charAt(i) == 'z') {
        out.write(0); out.write(0); out.write(0); out.write(0); i += 1
      } else {
        val group = src.substring(i, math.min(i + 5, src.length))
        val pad = 5 - group.length
        var v = 0L
        (group + "u" * pad).foreach(c => v = v * 85 + (c - '!'))
        val bytes = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        out.write(bytes, 0, 4 - pad)
        i += 5
      }
    }
    out.toByteArray
  }

  /** LZWDecode (ISO 32000-1 §7.4.4): MSB-first variable-width codes
    * (9 → 12 bits), table entries 0–255 = single bytes, 256 = clear-table,
    * 257 = EOD; `earlyChange` (default 1 per the spec) widens the code one
    * table entry early. Corrupt input yields the bytes decoded so far —
    * consistent with the parser's tolerate-and-continue contract.
    */
  private[graft] def lzw(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 3))
    val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
    def resetTable(): Unit = {
      table.clear()
      var b = 0
      while (b < 256) { table += Array(b.toByte); b += 1 }
      table += null // 256: clear marker
      table += null // 257: EOD marker
    }
    resetTable()
    var width = 9
    var prev: Array[Byte] = null
    var bitBuf = 0L
    var nBits = 0
    var i = 0
    var done = false
    while (i < data.length && !done) {
      bitBuf = (bitBuf << 8) | (data(i) & 0xff)
      nBits += 8
      i += 1
      while (nBits >= width && !done) {
        val code = ((bitBuf >>> (nBits - width)) & ((1L << width) - 1)).toInt
        nBits -= width
        if (code == 256) { resetTable(); width = 9; prev = null }
        else if (code == 257) done = true
        else {
          val entry: Array[Byte] =
            if (code < table.length && table(code) != null) table(code)
            else if (prev != null && code == table.length) prev :+ prev(0) // KwKwK
            else { done = true; null } // corrupt: keep what we have
          if (entry != null) {
            out.write(entry, 0, entry.length)
            if (prev != null && table.length < 4096) table += (prev :+ entry(0))
            prev = entry
            // encoder widens when the NEXT code would not fit; EarlyChange
            // shifts that boundary one entry earlier (table.length is the
            // next code to be assigned)
            if (width < 12 && table.length + earlyChange >= (1 << width))
              width += 1
          }
        }
      }
    }
    out.toByteArray
  }

  // ---- document structure --------------------------------------------------

  /** Page dicts in document order: catalog → /Pages → /Kids walk; fallback
    * to `/Type /Page` objects in object-number order when no tree resolves.
    */
  private[extract] def pageObjects(objects: Map[Int, PdfObj]): Seq[(Int, String)] = {
    val catalog = objects.valuesIterator
      .find(o => o.dict.contains("/Catalog"))
    val fromTree = catalog.flatMap(c => refAfter(c.dict, "/Pages")).map { rootRef =>
      val out = Seq.newBuilder[(Int, String)]
      val seen = scala.collection.mutable.Set.empty[Int]
      def walk(ref: Int): Unit =
        if (seen.add(ref)) objects.get(ref).foreach { node =>
          if (isPageDict(node.dict)) out += ref -> node.dict
          else kidRefs(node.dict).foreach(walk)
        }
      walk(rootRef)
      out.result()
    }.filter(_.nonEmpty)
    fromTree.getOrElse {
      objects.toSeq.sortBy(_._1).filter(o => isPageDict(o._2.dict))
        .map { case (n, o) => n -> o.dict }
    }
  }

  private def isPageDict(dict: String): Boolean =
    ("/Type\\s*/Page\\b".r.findFirstIn(dict).isDefined) &&
      !("/Type\\s*/Pages\\b".r.findFirstIn(dict).isDefined)

  private def kidRefs(dict: String): Seq[Int] = {
    val i = dict.indexOf("/Kids")
    if (i < 0) return Nil
    val open = dict.indexOf('[', i)
    val close = dict.indexOf(']', open + 1)
    if (open < 0 || close < 0) return Nil
    "(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(dict.substring(open, close))
      .map(_.group(1).toInt).toSeq
  }

  /** A page's decoded content — /Contents single ref or array of refs. */
  private[extract] def contentStreams(pageDict: String, objects: Map[Int, PdfObj]): Seq[Array[Byte]] = {
    val i = pageDict.indexOf("/Contents")
    if (i < 0) return Nil
    val tail = pageDict.substring(i + 9)
    val refs: Seq[Int] =
      if (tail.dropWhile(_.isWhitespace).startsWith("[")) {
        val open = tail.indexOf('[')
        val close = tail.indexOf(']', open)
        "(\\d+)\\s+\\d+\\s+R".r
          .findAllMatchIn(tail.substring(open, if (close < 0) tail.length else close))
          .map(_.group(1).toInt).toSeq
      } else refAfter(pageDict, "/Contents").toSeq
    refs.flatMap(r => objects.get(r).flatMap(decodeStream))
  }

  /** Resource-name → Font for a page (resources inline or by ref; /Parent
    * inheritance handled by the tree walk passing dicts whose /Resources
    * resolve here).
    */
  private[extract] def pageFonts(pageDict: String, objects: Map[Int, PdfObj]): Map[String, PdfFonts.Font] = {
    val resDict: Option[String] =
      refAfter(pageDict, "/Resources").flatMap(objects.get).map(_.dict)
        .orElse {
          val i = pageDict.indexOf("/Resources")
          if (i < 0) None else Some(pageDict.substring(i))
        }
    resDict.toSeq.flatMap { res =>
      val fi = res.indexOf("/Font")
      if (fi < 0) Nil
      else {
        // /Font is either an inline << ... >> dict or a ref to one; bound
        // the name→ref parse to that dict so /XObject etc. can't leak in
        val tail = res.substring(fi + 5).dropWhile(_.isWhitespace)
        val fontDict: String =
          if (tail.startsWith("<<")) tail.substring(2, balancedDictEnd(tail))
          else refAfter(res.substring(fi), "/Font")
            .flatMap(objects.get).map(_.dict).getOrElse("")
        "/([\\w\\.]+)\\s+(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(fontDict)
          .map(m => m.group(1) -> loadFont(m.group(2).toInt, objects))
          .toSeq
      }
    }.toMap
  }

  /** Index just past the `>>` closing the `<<` that `s` starts with. */
  private def balancedDictEnd(s: String): Int = {
    var depth = 0
    var i = 0
    while (i + 1 < s.length) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return i - 2
      }
      else i += 1
    }
    s.length
  }

  private def loadFont(ref: Int, objects: Map[Int, PdfObj]): PdfFonts.Font =
    objects.get(ref).map { obj =>
      val dict = obj.dict
      val base = "/BaseFont\\s*/([#\\w+\\-\\.]+)".r
        .findFirstMatchIn(dict).map(_.group(1)).getOrElse("")
      val twoByte = dict.contains("/Type0")
      val toUni = refAfter(dict, "/ToUnicode")
        .flatMap(objects.get).flatMap(decodeStream)
        .map(b => PdfFonts.parseToUnicode(new String(b, StandardCharsets.ISO_8859_1)))
        .getOrElse(Map.empty)
      // /Encoding: named directly, or a dict (inline or by ref) with
      // /BaseEncoding + /Differences
      val encText: Option[String] = {
        val i = dict.indexOf("/Encoding")
        if (i < 0) None
        else {
          val tail = dict.substring(i + 9).dropWhile(_.isWhitespace)
          if (tail.startsWith("/")) Some(tail.takeWhile(c => c == '/' || c.isLetterOrDigit))
          else refAfter(dict, "/Encoding").flatMap(objects.get).map(_.dict)
            .orElse(Some(tail))
        }
      }
      // CM text fonts (TeX) without explicit encoding run on the builtin
      // OT1 layout; CMTT (typewriter) is ASCII-literal, CMMI/CMSY/CMEX are
      // math fonts (no text mapping attempted)
      val cmText = "^([A-Z]{6}\\+)?CM(?!TT|MI|SY|EX)".r.findFirstIn(base).isDefined
      val baseEnc = encText.map { e =>
        if (e.contains("WinAnsi")) "WinAnsi"
        else if (e.contains("MacRoman")) "MacRoman"
        else if (cmText) "OT1"
        else ""
      }.getOrElse(if (cmText) "OT1" else "")
      val diffs: Map[Int, String] = encText.filter(_.contains("/Differences")).map { e =>
        val open = e.indexOf('[', e.indexOf("/Differences"))
        val close = if (open >= 0) e.indexOf(']', open) else -1
        if (open < 0 || close < 0) Map.empty[Int, String]
        else {
          val toks = "(\\d+)|/([\\w\\.]+)".r.findAllMatchIn(e.substring(open + 1, close))
          var code = 0
          val out = Map.newBuilder[Int, String]
          toks.foreach { m =>
            if (m.group(1) != null) code = m.group(1).toInt
            else { out += code -> m.group(2); code += 1 }
          }
          out.result()
        }
      }.getOrElse(Map.empty)
      // widths: /Widths array + /FirstChar, else standard-14 family table
      val (stdW, defaultW, spaceW) = PdfFonts.Std14.widths(base)
      val widths: Map[Int, Int] = {
        val wi = dict.indexOf("/Widths")
        val fc = intAfter(dict, "/FirstChar").getOrElse(0)
        if (wi < 0) stdW
        else {
          val open = dict.indexOf('[', wi)
          val close = if (open >= 0) dict.indexOf(']', open) else -1
          if (open < 0 || close < 0) stdW
          else "[-\\d\\.]+".r.findAllIn(dict.substring(open + 1, close))
            .zipWithIndex
            .map { case (w, i) => (fc + i) -> math.round(w.toDouble).toInt }
            .toMap
        }
      }
      // Type0: real CID metrics from the descendant CIDFont's /W + /DW
      // (ISO 32000-1 §9.7.4.3) — CJK producers emit these, and the family
      // fallback would otherwise misplace every rect in a zh document
      val (cidW, cidDW) =
        if (!twoByte) (Map.empty[Int, Int], 1000)
        else {
          val desc = "/DescendantFonts\\s*\\[?\\s*(\\d+)\\s+\\d+\\s+R".r
            .findFirstMatchIn(dict).map(_.group(1).toInt)
            .flatMap(objects.get).map(_.dict)
          desc.map(d => (parseCidWidths(d), intAfter(d, "/DW").getOrElse(1000)))
            .getOrElse((Map.empty[Int, Int], 1000))
        }
      val effWidths = if (twoByte) cidW else widths
      val effDefault = if (twoByte) cidDW else defaultW
      val sw = effWidths.getOrElse(' '.toInt, spaceW)
      PdfFonts.Font(base, twoByte, toUni, diffs, baseEnc, effWidths, effDefault, sw)
    }.getOrElse(PdfFonts.default)

  /** CIDFont `/W` array: `[ c [w1 w2 …]  cFirst cLast w  … ]` → cid → width.
    * Identity-H encoding (the overwhelmingly common case) makes cid = code.
    */
  private[extract] def parseCidWidths(cidFontDict: String): Map[Int, Int] = {
    val wi = cidFontDict.indexOf("/W")
    if (wi < 0) return Map.empty
    val open = cidFontDict.indexOf('[', wi)
    if (open < 0) return Map.empty
    // find the matching close bracket (nested arrays inside)
    var depth = 0
    var i = open
    var close = -1
    while (i < cidFontDict.length && close < 0) {
      cidFontDict.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    if (close < 0) return Map.empty
    val body = cidFontDict.substring(open + 1, close)
    val out = Map.newBuilder[Int, Int]
    // tokenize: numbers and bracketed number lists
    val tok = java.util.regex.Pattern.compile("""\[([^\]]*)\]|(-?[\d\.]+)""")
    val m = tok.matcher(body)
    val pending = scala.collection.mutable.ArrayBuffer.empty[Double]
    while (m.find()) {
      if (m.group(1) != null) {
        // c [w1 w2 ...]
        if (pending.nonEmpty) {
          val c = math.round(pending.remove(pending.length - 1)).toInt
          pending.clear()
          var cid = c
          """-?[\d\.]+""".r.findAllIn(m.group(1)).foreach { w =>
            out += cid -> math.round(w.toDouble).toInt
            cid += 1
          }
        }
      } else {
        pending += m.group(2).toDouble
        if (pending.length == 3) {
          // cFirst cLast w
          val w = math.round(pending(2)).toInt
          (math.round(pending(0)).toInt to math.round(pending(1)).toInt)
            .foreach(c => out += c -> w)
          pending.clear()
        }
      }
    }
    out.result()
  }

  // ---- content interpretation ----------------------------------------------

  /** Tiny content-stream interpreter for the text operators, font-aware. */
  private def interpret(
      content: String,
      page: Int,
      fonts: Map[String, PdfFonts.Font]): Seq[Block] = {
    val toks = tokenize(content)
    val blocks = ArrayBuffer.empty[Block]
    var i = 0
    var inText = false
    var x = 0.0
    var y = 0.0
    var leading = 0.0
    var fontSize = 12.0
    var font = PdfFonts.default
    var blockX = 0.0
    var blockY = 0.0
    var maxX = 0.0
    var lines = ArrayBuffer.empty[String]
    var line = new java.lang.StringBuilder
    var cursorX = 0.0 // pen position within the current line (user units)
    val operands = ArrayBuffer.empty[Token]

    def newLine(): Unit = {
      if (line.length > 0 || lines.nonEmpty) {
        lines += line.toString; line = new java.lang.StringBuilder
      }
      cursorX = x
    }
    def flushBlock(): Unit = {
      newLine()
      val text = lines.filter(_.nonEmpty).mkString("\n")
      if (text.trim.nonEmpty) blocks += Block(page, blockX, blockY, text, maxX)
      lines = ArrayBuffer.empty[String]
      line = new java.lang.StringBuilder
      maxX = 0.0
    }
    def num(t: Token): Double = t match {
      case NumTok(v) => v
      case _ => 0.0
    }
    def show(raw: String): Unit = {
      line.append(font.decode(raw))
      // advance pen by glyph widths for the block bbox
      if (font.twoByte) {
        var k = 0
        while (k + 1 < raw.length) {
          val code = ((raw.charAt(k) & 0xff) << 8) | (raw.charAt(k + 1) & 0xff)
          cursorX += font.width(code) * fontSize / 1000.0
          k += 2
        }
      } else {
        var k = 0
        while (k < raw.length) {
          cursorX += font.width(raw.charAt(k) & 0xff) * fontSize / 1000.0
          k += 1
        }
      }
      if (cursorX > maxX) maxX = cursorX
    }

    while (i < toks.length) {
      toks(i) match {
        case OpTok(op) =>
          op match {
            case "BT" =>
              inText = true; x = 0; y = 0; blockX = 0; blockY = 0; cursorX = 0
            case "ET" =>
              if (inText) flushBlock(); inText = false
            case "Tf" if operands.length >= 2 =>
              fontSize = num(operands.last)
              operands(operands.length - 2) match {
                case NameTok(n) => font = fonts.getOrElse(n, PdfFonts.default)
                case _ => ()
              }
            case "Td" if operands.length >= 2 =>
              x += num(operands(operands.length - 2)); y += num(operands.last)
              if (lines.isEmpty && line.length == 0) { blockX = x; blockY = y; cursorX = x }
              else newLine()
            case "TD" if operands.length >= 2 =>
              leading = -num(operands.last)
              x += num(operands(operands.length - 2)); y += num(operands.last)
              if (lines.isEmpty && line.length == 0) { blockX = x; blockY = y; cursorX = x }
              else newLine()
            case "TL" if operands.nonEmpty =>
              leading = num(operands.last)
            case "T*" =>
              y -= leading
              newLine()
            case "Tm" if operands.length >= 6 =>
              x = num(operands(operands.length - 2)); y = num(operands.last)
              if (lines.isEmpty && line.length == 0) { blockX = x; blockY = y; cursorX = x }
              else newLine()
            case "Tj" | "'" | "\"" =>
              if (op != "Tj") { y -= leading; newLine() }
              operands.lastOption.foreach {
                case StrTok(s, _, _) => show(s)
                case _ => ()
              }
            case "TJ" =>
              operands.foreach {
                case StrTok(s, _, _) => show(s)
                case NumTok(adj) =>
                  cursorX -= adj * fontSize / 1000.0
                  // TeX-style word gap: a negative adjustment bigger than
                  // ~⅓ of the font's space width is an inter-word space
                  // (PyMuPDF's extractor makes the same call via MuPDF)
                  if (adj <= -math.max(120.0, font.spaceWidth * 0.55) &&
                      line.length > 0 && line.charAt(line.length - 1) != ' ')
                    line.append(' ')
                case _ => ()
              }
              if (cursorX > maxX) maxX = cursorX
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

  private[extract] sealed trait Token
  private[extract] final case class NumTok(v: Double) extends Token
  /** `start`/`end`: source span of the whole string token (delimiters
    * included) in the content string — lets [[PdfRewrite]] splice edited
    * tokens back in place.
    */
  private[extract] final case class StrTok(s: String, start: Int = -1, end: Int = -1) extends Token
  private[extract] final case class NameTok(n: String) extends Token
  private[extract] final case class OpTok(op: String) extends Token
  private[extract] case object OtherTok extends Token

  private[extract] def tokenize(s: String): IndexedSeq[Token] = {
    val out = ArrayBuffer.empty[Token]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '%') { // comment to EOL
        while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
      } else if (c == '(') {
        val tokStart = i
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
              case '\r' => // line continuation
                i += 2; if (i < n && s.charAt(i) == '\n') i += 1
              case '\n' => i += 2
              case d if d >= '0' && d <= '7' =>
                var j = i + 1
                var v = 0
                while (j < n && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                  v = v * 8 + (s.charAt(j) - '0'); j += 1
                }
                sb.append((v & 0xff).toChar); i = j
              case other => sb.append(other); i += 2
            }
          } else {
            if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            if (depth > 0) sb.append(ch)
            i += 1
          }
        }
        out += StrTok(sb.toString, tokStart, i)
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) != '<') {
        val tokStart = i
        val end = s.indexOf('>', i + 1)
        val hex = s.substring(i + 1, if (end < 0) n else end).replaceAll("\\s", "")
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < hex.length) {
          val pair = if (j + 1 < hex.length) hex.substring(j, j + 2) else hex.substring(j) + "0"
          sb.append(Integer.parseInt(pair, 16).toChar)
          j += 2
        }
        i = if (end < 0) n else end + 1
        out += StrTok(sb.toString, tokStart, i)
      } else if (c == '<' || c == '>') {
        i += 2 // dict delimiters << >>
        out += OtherTok
      } else if (c == '[' || c == ']') {
        i += 1 // TJ arrays: flatten — strings and kern numbers both reach TJ
      } else if (c == '/') {
        var j = i + 1
        while (j < n && !s.charAt(j).isWhitespace && !"()<>[]/%".contains(s.charAt(j))) j += 1
        out += NameTok(s.substring(i + 1, j))
        i = j
      } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
        var j = i + 1
        while (j < n && (s.charAt(j).isDigit || s.charAt(j) == '.')) j += 1
        val tok = s.substring(i, j)
        out += (try NumTok(tok.toDouble) catch { case _: NumberFormatException => OtherTok })
        i = j
      } else {
        var j = i
        while (j < n && !s.charAt(j).isWhitespace && !"()<>[]/%".contains(s.charAt(j))) j += 1
        val op = s.substring(i, j)
        if (op == "BI") {
          // inline image: BI <dict> ID <raw binary> EI — the binary payload
          // would garble token lexing (scanned PDFs embed these); skip to
          // the EI delimiter (whitespace-bounded, best effort without the
          // image length)
          var k = s.indexOf("EI", j)
          while (k > 0 && !(k + 2 >= n || s.charAt(k + 2).isWhitespace ||
              s.charAt(k + 2) == '/') ||
              (k > 0 && !s.charAt(k - 1).isWhitespace))
            k = s.indexOf("EI", k + 1)
          out += OtherTok
          i = if (k < 0) n else k + 2
        } else {
          out += OpTok(op)
          i = math.max(j, i + 1)
        }
      }
    }
    out.toIndexedSeq
  }
}
