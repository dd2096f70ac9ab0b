package graft.extract

import graft.model.Segment

/** K4 — image redaction-rect resolution
  * (`/root/reference/src/deid_pipeline/handlers/image.py:56-141`): per
  * entity, prefer its own bbox anchor (strategy `entity_bbox`); otherwise
  * every page-matched segment whose offsets overlap the entity span
  * contributes its bbox (strategy `segment_overlap`). Rects dedupe on the
  * raw (l, t, r, b) key ACROSS entities, first-seen wins — exactly the
  * reference's `seen` set.
  *
  * The pixel fill (`cv2.rectangle`/`imencode`) is the codec-gated leaf (no
  * image libs in this environment); everything up to the rect list — the
  * part with dataflow semantics — is real and spec-pinned. Pairs with the
  * S6 OCR extraction whose segments carry exactly these bbox anchors.
  */
object ImageRedact {

  final case class Ent(
      typ: String,
      start: Int,
      end: Int,
      bbox: Option[Seq[Int]] = None,
      pageIndex: Option[Int] = None)

  final case class Rect(
      pageIndex: Int,
      left: Int, top: Int, right: Int, bottom: Int,
      entityType: String,
      strategy: String,
      segmentId: Option[Int] = None)

  def resolveRects(entities: Seq[Ent], segments: Seq[Segment]): Seq[Rect] = {
    val seen = scala.collection.mutable.Set.empty[(Int, Int, Int, Int)]
    val out = Seq.newBuilder[Rect]
    entities.foreach { e =>
      e.bbox match {
        case Some(b) if b.length == 4 =>
          val key = (b(0), b(1), b(2), b(3))
          if (seen.add(key))
            out += Rect(e.pageIndex.getOrElse(0), b(0), b(1), b(2), b(3),
              e.typ, "entity_bbox")
        case Some(b) if b.nonEmpty =>
          // malformed (truthy but not 4 values): reference `continue`s —
          // the entity contributes NO rect, not a segment-overlap fallback
          // (image.py:69-72)
          ()
        case _ =>
          segments.foreach { seg =>
            val pageOk = (e.pageIndex, seg.page_index) match {
              case (Some(ep), Some(sp)) => ep == sp
              case _ => true // reference skips the check when either is None
            }
            seg.bbox match {
              case Some(b) if b.length == 4 && pageOk &&
                  !(seg.end <= e.start || seg.start >= e.end) =>
                val key = (b(0), b(1), b(2), b(3))
                if (seen.add(key))
                  out += Rect(seg.page_index.getOrElse(0), b(0), b(1), b(2), b(3),
                    e.typ, "segment_overlap", Some(seg.segment_id))
              case _ =>
            }
          }
      }
    }
    out.result()
  }
}
