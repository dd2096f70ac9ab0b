package graft.functions

import scala.collection.mutable

/** Bit-exact clone of CPython difflib `SequenceMatcher(None, a, b).ratio()`
  * over code points — the reference's non-PII-similarity metric (G4,
  * `/root/reference/src/deid_pipeline/training/deid_eval.py:140-143`).
  *
  * Includes difflib's autojunk rule: when `len(b) >= 200`, elements occurring
  * in more than 1% of b are dropped from the index (but can still extend
  * matches at the edges), exactly as CPython's `__chain_b` +
  * `find_longest_match` do.
  */
object SeqMatcher {

  final case class Match(a: Int, b: Int, size: Int)

  def ratio(aStr: String, bStr: String): Double = {
    val a = aStr.codePoints().toArray
    val b = bStr.codePoints().toArray
    val matches = matchingBlocks(a, b).map(_.size.toLong).sum
    val length = a.length.toLong + b.length.toLong
    if (length > 0) 2.0 * matches / length else 1.0
  }

  def matchingBlocks(a: Array[Int], b: Array[Int]): List[Match] =
    matchingBlocks(a, b, autojunk = true)

  /** difflib `get_opcodes()` over already-interned element ids. */
  def opcodes(a: Array[Int], b: Array[Int], autojunk: Boolean)
      : List[(String, Int, Int, Int, Int)] = {
    val blocks = matchingBlocks(a, b, autojunk) :+ Match(a.length, b.length, 0)
    var i = 0
    var j = 0
    val out = mutable.ListBuffer.empty[(String, Int, Int, Int, Int)]
    blocks.foreach { m =>
      val tag =
        if (i < m.a && j < m.b) "replace"
        else if (i < m.a) "delete"
        else if (j < m.b) "insert"
        else ""
      if (tag.nonEmpty) out += ((tag, i, m.a, j, m.b))
      if (m.size > 0) out += (("equal", m.a, m.a + m.size, m.b, m.b + m.size))
      i = m.a + m.size
      j = m.b + m.size
    }
    out.toList
  }

  def matchingBlocks(a: Array[Int], b: Array[Int], autojunk: Boolean): List[Match] = {
    // __chain_b with autojunk
    val b2j = mutable.HashMap.empty[Int, mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < b.length) {
      b2j.getOrElseUpdate(b(i), mutable.ArrayBuffer.empty) += i
      i += 1
    }
    if (autojunk && b.length >= 200) {
      val ntest = b.length / 100 + 1
      val popular = b2j.iterator.filter(_._2.length > ntest).map(_._1).toList
      popular.foreach(b2j.remove)
    }

    def findLongestMatch(alo: Int, ahi: Int, blo: Int, bhi: Int): Match = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var ii = alo
      while (ii < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a(ii)) match {
          case Some(idxs) =>
            var p = 0
            var break = false
            while (p < idxs.length && !break) {
              val j = idxs(p)
              if (j >= bhi) break = true
              else if (j >= blo) {
                val k = j2len.getOrElse(j - 1, 0) + 1
                newj2len(j) = k
                if (k > bestsize) { besti = ii - k + 1; bestj = j - k + 1; bestsize = k }
              }
              p += 1
            }
          case None => ()
        }
        j2len = newj2len
        ii += 1
      }
      // bjunk is empty (no isjunk fn) ⇒ only the non-junk extension applies
      while (besti > alo && bestj > blo && a(besti - 1) == b(bestj - 1)) {
        besti -= 1; bestj -= 1; bestsize += 1
      }
      while (besti + bestsize < ahi && bestj + bestsize < bhi &&
        a(besti + bestsize) == b(bestj + bestsize)) {
        bestsize += 1
      }
      Match(besti, bestj, bestsize)
    }

    // get_matching_blocks: LIFO queue exactly like difflib
    val matchingBlocks = mutable.ArrayBuffer.empty[Match]
    val queue = mutable.Stack((0, a.length, 0, b.length))
    while (queue.nonEmpty) {
      val (alo, ahi, blo, bhi) = queue.pop()
      val m = findLongestMatch(alo, ahi, blo, bhi)
      if (m.size > 0) {
        matchingBlocks += m
        if (alo < m.a && blo < m.b) queue.push((alo, m.a, blo, m.b))
        if (m.a + m.size < ahi && m.b + m.size < bhi)
          queue.push((m.a + m.size, ahi, m.b + m.size, bhi))
      }
    }
    val sorted = matchingBlocks.sortBy(m => (m.a, m.b))
    // merge adjacent blocks (difflib's non_adjacent pass)
    val out = mutable.ListBuffer.empty[Match]
    var (i1, j1, k1) = (0, 0, 0)
    sorted.foreach { m =>
      if (i1 + k1 == m.a && j1 + k1 == m.b) k1 += m.size
      else {
        if (k1 > 0) out += Match(i1, j1, k1)
        i1 = m.a; j1 = m.b; k1 = m.size
      }
    }
    if (k1 > 0) out += Match(i1, j1, k1)
    out.toList
  }
}
