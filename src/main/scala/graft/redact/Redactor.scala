package graft.redact

import graft.detect.CpOffsets
import graft.functions.{Digests, FakeProvider}
import graft.model.{DeidEvent, SpanEnt}

/** Replacement / masking — exact clone of `Replacer`
  * (`/root/reference/src/deid_pipeline/pii/utils/replacer.py:16-102`).
  *
  * Entities are spliced right-to-left (sorted by start **descending**,
  * stable) against the *running* string, with `original` always sliced from
  * the *original* text — including the reference's behavior on residual
  * overlaps (resolution keeps overlaps with ratio <= 0.5, and the splice then
  * operates on already-modified suffixes; we replicate, not fix).
  *
  * All indices are Unicode code points (Python slicing semantics).
  */
object Redactor {

  /** Raw event as the replacer emits it, before the pipeline's filter. */
  final case class RawEvent(
      typ: String,
      original: Option[String],
      replacement: Option[String],
      start: Int,
      end: Int,
      source: String
  )

  /** `_replace_mode` (`replacer.py:41-81`). `contextHash` defaults to
    * sha256 of the text (`replacer.py:46-48`).
    */
  def replaceMode(
      text: String,
      entities: Array[SpanEnt],
      contextHash: Option[String] = None,
      isTw: Boolean = true
  ): (String, List[RawEvent]) = {
    val ctx = contextHash.getOrElse(Digests.sha256Hex(text))
    val sortedDesc = entities.sortBy(e => -e.start) // stable on equal starts
    var cur = text
    val events = List.newBuilder[RawEvent]
    var i = 0
    while (i < sortedDesc.length) {
      val ent = sortedDesc(i)
      val original = cpSlice(text, ent.start, ent.end)
      val replacement =
        FakeProvider.generateDeterministic(ent.typ, original, ctx, isTw)
      cur = splice(cur, ent.start, ent.end, replacement)
      events += RawEvent(
        ent.typ,
        Some(original),
        Some(replacement),
        ent.start,
        ent.start + replacement.codePointCount(0, replacement.length),
        ent.source
      )
      i += 1
    }
    (cur, events.result())
  }

  /** `_blackbox_mode` (`replacer.py:83-102`) — length-preserving masking. */
  def blackboxMode(
      text: String,
      entities: Array[SpanEnt]
  ): (String, List[RawEvent]) = {
    val sortedDesc = entities.sortBy(e => -e.start)
    var cur = text
    val events = List.newBuilder[RawEvent]
    var i = 0
    while (i < sortedDesc.length) {
      val ent = sortedDesc(i)
      val blackbox = "█" * (ent.end - ent.start)
      cur = splice(cur, ent.start, ent.end, blackbox)
      events += RawEvent(ent.typ, None, None, ent.start, ent.start + blackbox.length, ent.source)
      i += 1
    }
    (cur, events.result())
  }

  /** `"replacement"/"replace" → replace`, `"blackbox/black/redact/mask" →
    * blackbox`, default replace (`__init__.py:150-157`, `replacer.py:36-39`).
    */
  def normalizeMode(mode: String): String = {
    val m = Option(mode).getOrElse("").trim.toLowerCase
    if (m == "blackbox" || m == "black" || m == "redact" || m == "mask") "blackbox"
    else "replace"
  }

  /** The pipeline's event filter + replacement-map build
    * (`__init__.py:98-117`): only events carrying original+replacement+type
    * survive; map key `"TYPE:original"`, later events overwrite.
    */
  def filterEvents(raw: List[RawEvent]): (List[DeidEvent], Map[String, String]) = {
    val events = List.newBuilder[DeidEvent]
    var map = scala.collection.immutable.ListMap.empty[String, String]
    raw.foreach { ev =>
      (ev.original, ev.replacement) match {
        case (Some(o), Some(r)) =>
          map = map.updated(s"${ev.typ}:$o", r)
          events += DeidEvent(ev.typ, o, r, ev.start, ev.end, ev.source)
        case _ => ()
      }
    }
    (events.result(), map)
  }

  /** Python `text[s:e]` by code points. */
  def cpSlice(s: String, start: Int, end: Int): String = {
    val off = new CpOffsets(s)
    val cpLen = off.cpLen
    val s2 = math.min(math.max(start, 0), cpLen)
    val e2 = math.min(math.max(end, s2), cpLen)
    s.substring(off.toU16(s2), off.toU16(e2))
  }

  /** Python `text[:s] + r + text[e:]` by code points. */
  def splice(s: String, start: Int, end: Int, replacement: String): String = {
    val off = new CpOffsets(s)
    val cpLen = off.cpLen
    val s2 = math.min(math.max(start, 0), cpLen)
    val e2 = math.min(math.max(end, s2), cpLen)
    val u16s = off.toU16(s2)
    val u16e = off.toU16(e2)
    new java.lang.StringBuilder(s.length + replacement.length)
      .append(s, 0, u16s)
      .append(replacement)
      .append(s, u16e, s.length)
      .toString
  }
}
