package graft.extract

import graft.model.{Entity, Segment}

/** Segment concatenation with running offsets and anchor attachment.
  *
  * `build` clones `build_document_from_segments`
  * (`/root/reference/src/deid_pipeline/handlers/base.py:61-105`): segment i
  * occupies `[start, start+len)` in the concatenated text; the separator is
  * inserted *between* segments only (after every segment except the last)
  * and belongs to no segment. Offsets are code points.
  *
  * `attachAnchors` clones `attach_segment_anchors`
  * (`/root/reference/src/deid_pipeline/core/anchors.py:10-48`): binary search
  * on segment starts; anchors attach only when the span lies fully inside a
  * single segment.
  */
object Segments {

  final case class Doc(text: String, segments: IndexedSeq[Segment])

  final case class Spec(
      text: String,
      pageIndex: Option[Int] = None,
      bbox: Option[Seq[Int]] = None,
      cell: Option[Map[String, String]] = None
  )

  def build(specs: Seq[Spec], separator: String = "\n"): Doc = {
    val parts = new java.lang.StringBuilder
    val segs = IndexedSeq.newBuilder[Segment]
    var cursor = 0
    val sepLen = separator.codePointCount(0, separator.length)
    var idx = 0
    specs.foreach { spec =>
      val segText = Option(spec.text).getOrElse("")
      val len = segText.codePointCount(0, segText.length)
      segs += Segment(idx, cursor, cursor + len, segText, spec.pageIndex, spec.bbox, spec.cell)
      parts.append(segText)
      cursor += len
      if (idx != specs.length - 1) {
        parts.append(separator)
        cursor += sepLen
      }
      idx += 1
    }
    Doc(parts.toString, segs.result())
  }

  /** Returns entities with anchor columns resolved (pure; the reference
    * mutates in place). Result aligns 1:1 with the input order.
    */
  def anchorOf(
      entity: Entity,
      segments: IndexedSeq[Segment]
  ): Option[Segment] = {
    if (segments.isEmpty) return None
    val ordered = segments.sortBy(_.start)
    // bisect_right(starts, start) - 1
    var lo = 0
    var hi = ordered.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordered(mid).start <= entity.start) lo = mid + 1 else hi = mid
    }
    val idx = lo - 1
    if (idx < 0) None
    else {
      val seg = ordered(idx)
      if (seg.start <= entity.start && entity.start < seg.end && entity.end <= seg.end)
        Some(seg)
      else None
    }
  }
}
