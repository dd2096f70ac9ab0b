package graft.detect

import graft.model.SpanEnt

/** Composite-detector conflict resolution — exact clone of
  * `CompositeDetector._resolve_conflicts` / `_pick_winner`
  * (`/root/reference/src/deid_pipeline/pii/detectors/composite.py:35-106`).
  *
  * Semantics that are easy to get subtly wrong (SURVEY §7.4.5):
  *  - sort by start only, **stable** (Python `sorted`): equal starts keep
  *    detector emission order;
  *  - each candidate is compared against the current `resolved.last` only;
  *  - overlap ratio = overlap / min(len) with len floor 1; keep both when
  *    ratio <= 0.5;
  *  - winner: higher `ENTITY_PRIORITY`, then higher score, then **shorter**
  *    `source` string, else the earlier one; a winning candidate *replaces*
  *    the last resolved entry.
  */
object Resolver {

  def resolve(entities: Array[SpanEnt]): Array[SpanEnt] = {
    if (entities.isEmpty) return entities
    val sorted = entities.sortBy(_.start) // scala.collection sort is stable (TimSort)
    val resolved = new scala.collection.mutable.ArrayBuffer[SpanEnt](sorted.length)
    var i = 0
    while (i < sorted.length) {
      val cur = sorted(i)
      if (resolved.isEmpty) resolved += cur
      else {
        val last = resolved.last
        if (cur.start >= last.end) resolved += cur
        else {
          val overlap = math.max(0, math.min(last.end, cur.end) - cur.start)
          val lastLen = math.max(1, last.end - last.start)
          val curLen = math.max(1, cur.end - cur.start)
          val ratio = overlap.toDouble / math.min(lastLen, curLen)
          if (ratio <= 0.5) resolved += cur
          else if (pickWinnerIsSecond(last, cur)) resolved(resolved.length - 1) = cur
        }
      }
      i += 1
    }
    resolved.toArray
  }

  /** True iff `_pick_winner(a, b)` returns `b`. */
  private def pickWinnerIsSecond(a: SpanEnt, b: SpanEnt): Boolean = {
    val pa = RegexRules.priorityOf(a.typ)
    val pb = RegexRules.priorityOf(b.typ)
    if (pa != pb) pb > pa
    else if (a.score != b.score) b.score > a.score
    else if (a.source.length != b.source.length) b.source.length < a.source.length
    else false
  }
}
