package graft.extract

import java.nio.charset.StandardCharsets
import java.util.zip.Deflater
import scala.collection.mutable.ArrayBuffer

/** K3 generalized — black-box PII redaction of REAL-WORLD PDFs (the class
  * [[PdfExtract]] parses: object streams, Flate, font-encoded text), not
  * just the synthetic-builder subset [[PdfRedact]] handles.
  *
  * Mirrors the reference handler's rebuild contract
  * (`/root/reference/src/deid_pipeline/handlers/pdf.py:66-150` /
  * `page.apply_redactions()`): the covered glyphs are REMOVED from the
  * content streams (text unrecoverable by re-extraction) and black fill
  * rects are painted over their cells. Glyph geometry comes from the same
  * width tables the extractor uses, so search/cover/fill agree.
  *
  * Mechanics: a trace variant of the extractor's interpreter records, per
  * text-block code point, the source string token's span in the decoded
  * content stream plus the glyph's byte range inside that token and its
  * cell rect. Detection runs per block (same contract as the synthetic
  * path); covered glyphs are spliced out of their tokens (hex-string
  * re-emission, valid wherever a literal was), fills are appended after
  * the last ET, the page's /Contents is repointed at one new FlateDecode
  * stream, and the whole file is re-serialized classic-style (ObjStm
  * contents promoted to top-level objects, stale XRef streams dropped,
  * fresh xref table + trailer).
  *
  * Known limits (documented, inherent to the v1 geometry model): `cm`
  * transforms before BT are not applied to fill coordinates; removing
  * glyphs mid-token shifts the rest of that token's glyphs left (the black
  * box still covers the ORIGINAL cells, and extraction-level removal — the
  * verifiable contract — holds regardless); encrypted PDFs unsupported.
  */
object PdfRewrite {

  final case class Rect(
      page: Int, x0: Double, y0: Double, x1: Double, y1: Double, typ: String)

  /** One shown glyph: cell rect + exact source location. */
  private[graft] final case class Glyph(
      tokStart: Int, tokEnd: Int, // span of the string token in the content
      byteStart: Int, byteEnd: Int, // glyph's byte range inside the RAW token string
      x0: Double, y0: Double, x1: Double, y1: Double)

  /** One block: text + per-code-point glyph source (None = line separator). */
  private[graft] final case class TBlock(text: String, cps: IndexedSeq[Option[Glyph]])

  /** Redact a whole PDF: returns (rebuilt bytes, fill rects). */
  def redact(pdf: Array[Byte], lang: String = "zh"): (Array[Byte], Seq[Rect]) = {
    val raw = new String(pdf, StandardCharsets.ISO_8859_1)
    var objects = PdfExtract.expandObjStms(PdfExtract.scanObjects(raw))
    val pages = PdfExtract.pageObjects(objects)
    var nextObj = (objects.keySet + 0).max + 1
    val allRects = Seq.newBuilder[Rect]

    pages.zipWithIndex.foreach { case ((pageNum, pageDict), pageIdx) =>
      val fonts = PdfExtract.pageFonts(pageDict, objects)
      val content = PdfExtract.contentStreams(pageDict, objects)
        .map(b => new String(b, StandardCharsets.ISO_8859_1))
        .mkString("\n")
      if (content.nonEmpty) {
        val blocks = trace(content, fonts)
        // detect per block, resolve covered glyphs + rects
        val covered = ArrayBuffer.empty[Glyph]
        val rects = ArrayBuffer.empty[Rect]
        blocks.foreach { b =>
          val ents = graft.pipeline.DeidCore.detect(b.text, lang, withStub = false)
          ents.foreach { e =>
            val glyphs = (e.start until e.end)
              .flatMap(i => if (i < b.cps.length) b.cps(i) else None)
            if (glyphs.nonEmpty) {
              covered ++= glyphs
              // one rect per run of glyphs on the same baseline
              var run = ArrayBuffer(glyphs.head)
              def flushRun(): Unit = {
                rects += Rect(pageIdx,
                  run.map(_.x0).min, run.map(_.y0).min,
                  run.map(_.x1).max, run.map(_.y1).max, e.typ)
                run = ArrayBuffer.empty
              }
              glyphs.tail.foreach { g =>
                if (run.nonEmpty && math.abs(g.y0 - run.last.y0) < 0.01) run += g
                else { flushRun(); run += g }
              }
              if (run.nonEmpty) flushRun()
            }
          }
        }
        if (covered.nonEmpty) {
          // explicit Locale.US: the f-interpolator uses the default locale,
          // and a comma decimal separator would corrupt the content stream
          def n2(d: Double) = String.format(java.util.Locale.US, "%.2f", Double.box(d))
          val rewritten = spliceOut(content, covered.toSeq) +
            rects.map(r =>
              s"\nq 0 g ${n2(r.x0)} ${n2(r.y0)} ${n2(r.x1 - r.x0)} ${n2(r.y1 - r.y0)} re f Q")
              .mkString
          // new single content object; repoint the page dict
          val z = deflate(rewritten.getBytes(StandardCharsets.ISO_8859_1))
          val contentNum = nextObj
          nextObj += 1
          objects = objects +
            (contentNum -> PdfExtract.PdfObj(
              s"<< /Length ${z.length} /Filter /FlateDecode >>\n",
              Some(z))) +
            (pageNum -> PdfExtract.PdfObj(
              repointContents(pageDict, contentNum), None))
          allRects ++= rects
        }
      }
    }
    (serialize(objects), allRects.result())
  }

  /** Extraction-identical state machine, but records glyph provenance.
    * Visible to the spec: PdfRewriteSpec pins `trace`'s text byte-equal to
    * the extraction contract's output (detection during redaction must run
    * on exactly the text extraction produces).
    */
  private[graft] def trace(
      content: String,
      fonts: Map[String, PdfFonts.Font]): Seq[TBlock] = {
    val toks = PdfExtract.tokenize(content)
    val blocks = ArrayBuffer.empty[TBlock]
    var inText = false
    var x = 0.0
    var y = 0.0
    var leading = 0.0
    var fontSize = 12.0
    var font = PdfFonts.default
    var cursorX = 0.0
    val text = new java.lang.StringBuilder
    val cps = ArrayBuffer.empty[Option[Glyph]]
    val operands = ArrayBuffer.empty[PdfExtract.Token]

    def newLine(): Unit = {
      // suppress consecutive newlines: PdfExtract.interpret drops empty
      // lines, so back-to-back line ops (Td Td, Tm T*) must not produce
      // "a\n\nb" here — detection during redaction has to see the exact
      // text the extraction contract produces
      if (text.length() > 0 && text.charAt(text.length - 1) != '\n') {
        text.append('\n'); cps += None
      }
      cursorX = x
    }
    def flushBlock(): Unit = {
      if (text.length() > 0) {
        blocks += TBlock(text.toString, cps.toIndexedSeq)
      }
      text.setLength(0)
      cps.clear()
    }
    def num(t: PdfExtract.Token): Double = t match {
      case PdfExtract.NumTok(v) => v
      case _ => 0.0
    }
    def show(tok: PdfExtract.StrTok): Unit = {
      val rawS = tok.s
      val step = if (font.twoByte) 2 else 1
      var k = 0
      while (k + step - 1 < rawS.length) {
        val code =
          if (font.twoByte) ((rawS.charAt(k) & 0xff) << 8) | (rawS.charAt(k + 1) & 0xff)
          else rawS.charAt(k) & 0xff
        val w = font.width(code) * fontSize / 1000.0
        val decoded = font.decodeCode(code)
        val nCps = decoded.codePointCount(0, decoded.length)
        val g = Glyph(tok.start, tok.end, k, k + step,
          cursorX, y, cursorX + w, y + fontSize)
        var c = 0
        var ci = 0
        while (c < nCps) {
          val cp = decoded.codePointAt(ci)
          text.appendCodePoint(cp)
          cps += Some(g)
          ci += Character.charCount(cp)
          c += 1
        }
        cursorX += w
        k += step
      }
    }

    toks.foreach {
      case PdfExtract.OpTok(op) =>
        op match {
          case "BT" =>
            inText = true; x = 0; y = 0; cursorX = 0
          case "ET" =>
            if (inText) flushBlock(); inText = false
          case "Tf" if operands.length >= 2 =>
            fontSize = num(operands.last)
            operands(operands.length - 2) match {
              case PdfExtract.NameTok(n) => font = fonts.getOrElse(n, PdfFonts.default)
              case _ => ()
            }
          case "Td" | "TD" if operands.length >= 2 =>
            if (op == "TD") leading = -num(operands.last)
            x += num(operands(operands.length - 2)); y += num(operands.last)
            newLine()
          case "TL" if operands.nonEmpty =>
            leading = num(operands.last)
          case "T*" =>
            y -= leading; newLine()
          case "Tm" if operands.length >= 6 =>
            x = num(operands(operands.length - 2)); y = num(operands.last)
            newLine()
          case "Tj" | "'" | "\"" =>
            if (op != "Tj") { y -= leading; newLine() }
            operands.lastOption.foreach {
              case t: PdfExtract.StrTok => show(t)
              case _ => ()
            }
          case "TJ" =>
            operands.foreach {
              case t: PdfExtract.StrTok => show(t)
              case PdfExtract.NumTok(adj) =>
                cursorX -= adj * fontSize / 1000.0
                if (adj <= -math.max(120.0, font.spaceWidth * 0.55) &&
                    text.length() > 0 && text.charAt(text.length - 1) != ' ') {
                  text.append(' '); cps += None
                }
              case _ => ()
            }
          case _ => ()
        }
        operands.clear()
      case t => operands += t
    }
    if (inText) flushBlock()
    blocks.toSeq
  }

  /** Remove the covered glyph bytes from their source tokens, re-emitting
    * each touched token as a hex string (valid in any show-op position).
    */
  private def spliceOut(content: String, covered: Seq[Glyph]): String = {
    val byTok = covered.groupBy(g => (g.tokStart, g.tokEnd))
      .toSeq.sortBy(-_._1._1) // splice back-to-front so spans stay valid
    var out = content
    byTok.foreach { case ((ts, te), glyphs) =>
      if (ts >= 0 && te <= out.length) {
        val rawTok = reparseToken(content, ts, te)
        val drop = glyphs.flatMap(g => g.byteStart until g.byteEnd).toSet
        val kept = rawTok.zipWithIndex.collect {
          case (ch, i) if !drop.contains(i) => ch
        }
        val hex = kept.map(c => f"${c & 0xff}%02X").mkString("<", "", ">")
        out = out.substring(0, ts) + hex + out.substring(te)
      }
    }
    out
  }

  /** Decode one string token's raw bytes again (escape-processed for
    * literals, pair-decoded for hex) — the same value `trace` saw.
    */
  private def reparseToken(content: String, start: Int, end: Int): String =
    PdfExtract.tokenize(content.substring(start, end)).collectFirst {
      case PdfExtract.StrTok(s, _, _) => s
    }.getOrElse("")

  /** `/Contents …` (single ref or array) → `/Contents <n> 0 R`. */
  private def repointContents(pageDict: String, contentNum: Int): String = {
    val arr = java.util.regex.Pattern
      .compile("/Contents\\s*\\[[^\\]]*\\]").matcher(pageDict)
    if (arr.find())
      arr.replaceFirst(s"/Contents $contentNum 0 R")
    else
      pageDict.replaceFirst("/Contents\\s+\\d+\\s+\\d+\\s+R",
        s"/Contents $contentNum 0 R")
  }

  /** `N G R` with G > 0 — references into incrementally-updated files. */
  private val genRefPat =
    java.util.regex.Pattern.compile("(\\d+)\\s+[1-9]\\d*\\s+R\\b")

  /** Rewrite non-zero-generation refs to gen 0 — OUTSIDE (...) string
    * literals only, so metadata strings that merely look like `12 34 R`
    * (titles, dates) are never altered. Literal spans are walked with
    * PDF-spec escape and nested-paren handling and copied verbatim.
    */
  private[graft] def rewriteGenRefs(dict: String): String = {
    if (!genRefPat.matcher(dict).find()) return dict
    val sb = new java.lang.StringBuilder(dict.length)
    var i = 0
    var segStart = 0
    def flushOutside(end: Int): Unit =
      sb.append(genRefPat.matcher(dict.substring(segStart, end)).replaceAll("$1 0 R"))
    while (i < dict.length) {
      if (dict.charAt(i) == '(') {
        flushOutside(i)
        val litStart = i
        var depth = 1
        i += 1
        while (i < dict.length && depth > 0) {
          val c = dict.charAt(i)
          if (c == '\\' && i + 1 < dict.length) i += 2
          else {
            if (c == '(') depth += 1 else if (c == ')') depth -= 1
            i += 1
          }
        }
        sb.append(dict, litStart, i)
        segStart = i
      } else i += 1
    }
    flushOutside(dict.length)
    sb.toString
  }

  /** Classic serialization of the (expanded) object map: ObjStm and XRef
    * stream objects dropped (their payloads are top-level now / stale),
    * everything else byte-preserved except that non-zero-generation
    * indirect references are rewritten to generation 0 (every object is
    * re-emitted as `N 0 obj`); fresh xref + trailer.
    */
  private def serialize(objects: Map[Int, PdfExtract.PdfObj]): Array[Byte] = {
    val keep = objects.filterNot { case (_, o) =>
      o.dict.contains("/ObjStm") ||
        "/Type\\s*/XRef\\b".r.findFirstIn(o.dict).isDefined
    }
    val rootNum = keep.collectFirst {
      case (n, o) if o.dict.contains("/Catalog") => n
    }.getOrElse(1)
    val out = new java.io.ByteArrayOutputStream(1 << 20)
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n%âãÏÓ\n")
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    keep.toSeq.sortBy(_._1).foreach { case (n, o) =>
      offsets(n) = out.size()
      w(s"$n 0 obj\n")
      val body = if (o.dict.endsWith("\n") || o.dict.endsWith(" ")) o.dict else o.dict + "\n"
      // every object is re-emitted at generation 0, so indirect references
      // carrying a non-zero generation (incrementally-updated sources)
      // must be rewritten to gen 0 or they dangle in the rebuilt file
      w(rewriteGenRefs(body))
      o.stream.foreach { bytes =>
        w("stream\n")
        out.write(bytes)
        w("\nendstream\n")
      }
      w("endobj\n")
    }
    val maxObj = (keep.keySet + 0).max + 1
    val xrefPos = out.size()
    w(s"xref\n0 $maxObj\n")
    w("0000000000 65535 f \n")
    (1 until maxObj).foreach { n =>
      offsets.get(n) match {
        case Some(off) => w(f"$off%010d 00000 n \n")
        case None => w("0000000000 65535 f \n")
      }
    }
    w(s"trailer\n<< /Size $maxObj /Root $rootNum 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
