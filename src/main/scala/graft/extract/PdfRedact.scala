package graft.extract

/** A2/K3 — PDF redaction-rect resolution and black-box rebuild, on the same
  * deliberately-small PDF subset as [[PdfExtract]]/[[PdfBuilder]].
  *
  * Clones the reference's rebuild contract
  * (`/root/reference/src/deid_pipeline/handlers/pdf.py:66-150`):
  * entities grouped by page; per entity, `search_for(needle)` rects that
  * intersect the entity's block bbox; fallback to the whitespace-normalized
  * needle; fallback to the block bbox itself (strategy recorded per rect,
  * `pdf.py:125-130`); black-fill redactions applied and the underlying text
  * REMOVED (`page.apply_redactions()`, `pdf.py:139-147`).
  *
  * Geometry: PyMuPDF uses true glyph metrics; no PDF library ships here, so
  * this subset uses the synthetic fixed advance `charW` per character at the
  * builder's 12pt line height — deterministic and self-consistent between
  * search, redaction and rebuild (re-extraction proves the text is gone).
  */
object PdfRedact {

  /** Synthetic glyph advance / line height for the 12pt builder font. */
  val charW = 7.2
  val lineH = 12.0

  final case class Rect(
      page: Int, x0: Double, y0: Double, x1: Double, y1: Double, strategy: String)

  def blockRect(b: PdfExtract.Block): (Double, Double, Double, Double) = {
    val len = b.text.codePointCount(0, b.text.length)
    (b.x, b.y, b.x + charW * len, b.y + lineH)
  }

  private def intersects(
      a: (Double, Double, Double, Double),
      b: (Double, Double, Double, Double)): Boolean =
    a._1 < b._3 && b._1 < a._3 && a._2 < b._4 && b._2 < a._4

  /** `page.search_for(needle)`-analogue: every occurrence of the needle in
    * any block on the page, as a char-metric rect.
    */
  def searchFor(pageBlocks: Seq[PdfExtract.Block], needle: String): Seq[Rect] =
    if (needle.isEmpty) Nil
    else {
      // glyph cells are per CODE POINT (matching blockRect/cpSlice); convert
      // the UTF-16 match offset so supplementary-plane chars don't shift rects
      val needleCp = needle.codePointCount(0, needle.length)
      pageBlocks.flatMap { b =>
        Iterator.unfold(b.text.indexOf(needle)) { idx =>
          if (idx < 0) None
          else Some(idx -> b.text.indexOf(needle, idx + 1))
        }.map { idx =>
          val cpIdx = b.text.codePointCount(0, idx)
          Rect(b.page, b.x + charW * cpIdx, b.y,
            b.x + charW * (cpIdx + needleCp), b.y + lineH, "search_for")
        }.toSeq
      }
    }

  /** One entity's rects (`pdf.py:99-130`): search_for intersecting the block
    * bbox → normalized-needle search → block bbox fallback.
    */
  def resolveForEntity(
      pageBlocks: Seq[PdfExtract.Block],
      needle: String,
      block: (Double, Double, Double, Double),
      page: Int
  ): Seq[Rect] = {
    val trimmed = Option(needle).getOrElse("").trim
    if (trimmed.nonEmpty) {
      val direct = searchFor(pageBlocks, trimmed)
        .filter(r => intersects((r.x0, r.y0, r.x1, r.y1), block))
      if (direct.nonEmpty) return direct
      val norm = trimmed.split("\\s+").filter(_.nonEmpty).mkString(" ")
      if (norm.nonEmpty && norm != trimmed) {
        val fuzzy = searchFor(pageBlocks, norm)
          .filter(r => intersects((r.x0, r.y0, r.x1, r.y1), block))
        if (fuzzy.nonEmpty) return fuzzy
      }
    }
    Seq(Rect(page, block._1, block._2, block._3, block._4, "block_bbox"))
  }

  /** Whole-operator dataflow over one binary PDF: extract blocks → detect
    * per block (the rule regexes cannot cross the "\n" block separator) →
    * resolve rects → rebuild with covered glyphs removed and black boxes
    * drawn. Returns (rebuilt pdf, all redaction rects in emission order —
    * the reference does NOT dedupe, `pdf.py:123-131`).
    */
  def redact(pdf: Array[Byte], lang: String = "zh"): (Array[Byte], Seq[Rect]) = {
    val pages = PdfExtract.pageBlocks(pdf)
    val rects = pages.flatMap { case (page, blocks) =>
      blocks.flatMap { b =>
        val ents = graft.pipeline.DeidCore.detect(b.text, lang, withStub = false)
        val br = blockRect(b)
        ents.flatMap { e =>
          val needle = graft.redact.Redactor.cpSlice(b.text, e.start, e.end)
          resolveForEntity(blocks, needle, br, page)
        }
      }
    }
    (rebuild(pages, rects), rects)
  }

  /** Re-serialize: per block, characters whose glyph box intersects any rect
    * on the page are dropped (replaced by space — the visual gap
    * `apply_redactions` leaves), then the black fills are appended to the
    * content stream (`q 0 g … re f Q`).
    */
  def rebuild(
      pages: Seq[(Int, Seq[PdfExtract.Block])],
      rects: Seq[Rect]
  ): Array[Byte] = {
    val byPage = rects.groupBy(_.page)
    val contents = pages.map { case (page, blocks) =>
      val rs = byPage.getOrElse(page, Nil)
      val textOps = blocks.map { b =>
        val sb = new java.lang.StringBuilder
        var ci = 0 // UTF-16 offset
        var i = 0  // code-point (glyph-cell) index
        while (ci < b.text.length) {
          val cp = b.text.codePointAt(ci)
          val cx0 = b.x + charW * i
          val covered = rs.exists(r =>
            intersects((cx0, b.y, cx0 + charW, b.y + lineH), (r.x0, r.y0, r.x1, r.y1)))
          if (covered) sb.append(' ') else sb.appendCodePoint(cp)
          ci += Character.charCount(cp)
          i += 1
        }
        s"BT /F1 12 Tf ${fmt(b.x)} ${fmt(b.y)} Td (${PdfBuilder.escapeText(sb.toString)}) Tj ET"
      }
      val fillOps = rs.map(r =>
        s"q 0 g ${fmt(r.x0)} ${fmt(r.y0)} ${fmt(r.x1 - r.x0)} ${fmt(r.y1 - r.y0)} re f Q")
      (textOps ++ fillOps).mkString("\n")
    }
    PdfBuilder.build(contents, flate = true)
  }

  private def fmt(d: Double): String =
    if (d == math.rint(d)) d.toLong.toString else f"$d%.2f"
}
