package graft.detect

import graft.model.SpanEnt

import scala.collection.mutable

/** Aho–Corasick dictionary detector (north-rule requirement).
  *
  * The reference's "dictionary" vocabulary is the name/address word lists of
  * its deterministic generators
  * (`/root/reference/src/deid_pipeline/pii/utils/fake_provider.py:147-166`,
  * `/root/reference/src/deid_pipeline/training/synthetic.py:41-55`); its stub
  * detector scans two regexes instead (`bert_detector.py:162-177`, covered by
  * `Detectors.stubDetect`). We build a proper automaton so that a 100k-entry
  * gazetteer scans in O(text) per row: the automaton is built ONCE on the
  * driver and shipped inside the expression/closure (Spark task broadcast),
  * never rebuilt per row.
  *
  * Matching semantics: all occurrences of all dictionary entries, reported
  * leftmost, emitted in (end, entry) discovery order then sorted by start for
  * determinism; overlaps are left to the downstream conflict resolver (D7),
  * matching the composite's bag-union contract (`composite.py:15-33`).
  */
final class AhoCorasick private (
    goto: Array[mutable.LongMap[Int]],
    fail: Array[Int],
    outputs: Array[List[(Int, String)]] // (patternLenCp, typ)
) extends Serializable {

  /** Scan; spans in code points. Score 1.0, source "dict". */
  def detect(text: String): Array[SpanEnt] = {
    val off = new CpOffsets(text)
    val out = mutable.ArrayBuffer.empty[SpanEnt]
    var state = 0
    var i = 0
    var cpIdx = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      var s = state
      var next = goto(s).getOrElse(cp.toLong, -1)
      while (next < 0 && s != 0) {
        s = fail(s)
        next = goto(s).getOrElse(cp.toLong, -1)
      }
      state = if (next >= 0) next else 0
      val endCp = cpIdx + 1
      outputs(state).foreach { case (len, typ) =>
        out += SpanEnt(endCp - len, endCp, typ, 1.0, "dict")
      }
      i += Character.charCount(cp)
      cpIdx += 1
    }
    val arr = out.toArray
    scala.util.Sorting.stableSort(arr, (a: SpanEnt, b: SpanEnt) =>
      a.start < b.start || (a.start == b.start && a.end < b.end))
    arr
  }
}

object AhoCorasick {

  /** Build from (term, type) pairs. Terms are matched literally (code
    * points). Empty terms ignored.
    */
  def build(entries: Iterable[(String, String)]): AhoCorasick = {
    val goto = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val outs = mutable.ArrayBuffer[List[(Int, String)]](Nil)

    entries.foreach { case (term, typ) =>
      if (term != null && term.nonEmpty) {
        var state = 0
        var i = 0
        var len = 0
        while (i < term.length) {
          val cp = term.codePointAt(i)
          val nxt = goto(state).getOrElse(cp.toLong, -1)
          state =
            if (nxt >= 0) nxt
            else {
              goto += mutable.LongMap.empty[Int]
              outs += Nil
              val ns = goto.length - 1
              goto(state)(cp.toLong) = ns
              ns
            }
          i += Character.charCount(cp)
          len += 1
        }
        outs(state) = (len, typ) :: outs(state)
      }
    }

    val n = goto.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    goto(0).foreach { case (_, s) => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto(r).foreach { case (cp, s) =>
        queue += s
        var st = fail(r)
        while (st != 0 && !goto(st).contains(cp)) st = fail(st)
        fail(s) = goto(st).getOrElse(cp, 0) match {
          case `s` => 0 // self-transition from root
          case other => other
        }
        outs(s) = outs(s) ++ outs(fail(s))
      }
    }
    new AhoCorasick(goto.toArray, fail, outs.toArray)
  }

  /** The reference generators' PII vocabulary as the default gazetteer. */
  lazy val referenceVocab: Seq[(String, String)] = Seq(
    // fake_provider.py:147-151 / synthetic.py:41
    "王小明" -> "NAME", "陳怡君" -> "NAME", "林志明" -> "NAME", "張雅婷" -> "NAME",
    "John Smith" -> "NAME", "Alice Chen" -> "NAME",
    "Michael Brown" -> "NAME", "Emily Davis" -> "NAME",
    // fake_provider.py:157-166 / synthetic.py:42-46
    "台北市信義路1號" -> "ADDRESS", "新北市中山路10號" -> "ADDRESS",
    "台中市民生路99號" -> "ADDRESS",
    "1 Main St" -> "ADDRESS", "10 Broadway Ave" -> "ADDRESS",
    "99 Market Rd" -> "ADDRESS",
    // synthetic.py organizations used in test_data_factory.py
    "Example Organization" -> "ORGANIZATION"
  )

  lazy val default: AhoCorasick = build(referenceVocab)
}
