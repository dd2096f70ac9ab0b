package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.detect.{BioDecode, Logits}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class LogitsSpec extends AnyFunSuite {

  test("softmax matches CPython math (bit-level) on 25 golden vectors") {
    val in = getClass.getResourceAsStream("/golden_softmax.json")
    require(in != null)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    root.elements().asScala.foreach { c =>
      val xs = c.get("logits").elements().asScala.map(_.asDouble()).toArray
      val want = c.get("probs").elements().asScala.map(_.asDouble()).toArray
      val got = Logits.softmax(xs)
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) => assert(g == w, s"$g vs $w") }
    }
  }

  test("logits → scored tokens → BIO decode end-to-end") {
    val labels = Array("O", "B-PER", "I-PER")
    // token 0: CLS; token 1: strong B-PER; token 2: strong I-PER; token 3: O
    val logits = Array(
      Array(5.0, 0.0, 0.0),
      Array(0.0, 8.0, 0.0),
      Array(0.0, 0.0, 8.0),
      Array(6.0, 0.0, 0.0))
    val offsets = Array((0, 0), (0, 4), (5, 9), (10, 12))
    val special = Array(true, false, false, false)
    val toks = Logits.toScoredTokens(logits, offsets, special, labels)
    assert(toks(1).label == "B-PER" && toks(1).score > 0.99)
    val ents = BioDecode.decode(toks, threshold = 0.85)
    assert(ents.length == 1)
    assert(ents.head.typ == "NAME" && ents.head.start == 0 && ents.head.end == 9)
  }
}
