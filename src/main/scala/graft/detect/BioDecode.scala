package graft.detect

import graft.model.SpanEnt

/** D5/D6 — BIO decoding and overlapping-entity merge for model-backed
  * detectors. The model forward pass itself (torch/ONNX) is out of v1 scope
  * (SURVEY §7.6); this is the pure dataflow that a future ONNX-Runtime-Java
  * `mapPartitions` scorer plugs into, cloned from
  * `/root/reference/src/deid_pipeline/pii/detectors/bert_detector.py:96-160`
  * (the ONNX detector duplicates the same logic,
  * `bert_onnx_detector.py:83-174`).
  */
object BioDecode {

  /** `ENTITY_TYPE_MAP` (`bert_detector.py:16-25`). */
  val entityTypeMap: Map[String, String] = Map(
    "PER" -> "NAME", "PERSON" -> "NAME", "LOC" -> "ADDRESS", "GPE" -> "ADDRESS",
    "ORG" -> "ORGANIZATION", "ID" -> "ID", "PHONE" -> "PHONE", "EMAIL" -> "EMAIL")

  /** One scored token from a NER model. `special` marks CLS/SEP/PAD. */
  final case class ScoredToken(
      start: Int,
      end: Int,
      label: String, // "O", "B-X", "I-X"
      score: Double,
      special: Boolean = false
  )

  /** `_process_chunk`'s decode loop (`bert_detector.py:96-136`,
    * `bert_onnx_detector.py:96-137`): B- starts, same-type I- extends (span
    * end advances, score takes max), anything else closes; specials and
    * (0,0) offsets skipped; `offset` shifts spans into the full-text
    * coordinate space (sliding-window chunking, `bert_detector.py:59-63`).
    *
    * `threshold`: an "O" label OR a sub-threshold score CLOSES the current
    * entity in-loop (`bert_onnx_detector.py:105-109`) — it must NOT be
    * pre-filtered out, or a following same-type I- token would wrongly
    * extend across the low-confidence gap.
    */
  def decode(
      tokens: Seq[ScoredToken],
      offset: Int = 0,
      source: String = "bert",
      threshold: Double = 0.0
  ): List[SpanEnt] = {
    val out = scala.collection.mutable.ListBuffer.empty[SpanEnt]
    var cur: SpanEnt = null
    tokens.foreach { t =>
      if (!t.special && !(t.start == 0 && t.end == 0)) {
        if (t.label == "O" || t.score < threshold) {
          if (cur != null) { out += cur; cur = null }
        } else {
          val base = t.label.replace("B-", "").replace("I-", "")
          val typ = entityTypeMap.getOrElse(base, base)
          if (t.label.startsWith("B-")) {
            if (cur != null) out += cur
            cur = SpanEnt(t.start + offset, t.end + offset, typ, t.score, source)
          } else if (t.label.startsWith("I-") && cur != null && cur.typ == typ) {
            cur = cur.copy(end = t.end + offset, score = math.max(cur.score, t.score))
          } else {
            if (cur != null) out += cur
            cur = null
          }
        }
      }
    }
    if (cur != null) out += cur
    out.toList
  }

  /** Sliding-window chunk starts: stride = max(1, maxLen/2)
    * (`bert_detector.py:59-63`) — chunk i covers [i, i+maxLen).
    */
  def chunkStarts(textLen: Int, maxLen: Int): Seq[Int] = {
    val stride = math.max(1, maxLen / 2)
    if (textLen == 0) Seq(0) else 0 until textLen by stride
  }

  /** `_merge_entities` (`bert_detector.py:138-160`): sort by start; if
    * next.start <= last.end, same type, and overlap > 0.5×min-length →
    * extend last (max end, max score); else append.
    */
  def mergeEntities(entities: Seq[SpanEnt]): List[SpanEnt] = {
    if (entities.isEmpty) return Nil
    val sorted = entities.sortBy(_.start) // stable
    val merged = scala.collection.mutable.ListBuffer(sorted.head)
    sorted.tail.foreach { cur =>
      val last = merged.last
      var appended = false
      if (cur.start <= last.end) {
        val overlap = math.min(last.end, cur.end) - cur.start
        val minLen = math.min(last.end - last.start, cur.end - cur.start)
        if (cur.typ == last.typ && overlap > minLen * 0.5) {
          merged(merged.length - 1) = last.copy(
            end = math.max(last.end, cur.end),
            score = math.max(last.score, cur.score))
          appended = true
        }
      }
      if (!appended) merged += cur
    }
    merged.toList
  }
}
