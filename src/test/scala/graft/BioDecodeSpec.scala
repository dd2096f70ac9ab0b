package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.detect.BioDecode
import graft.detect.BioDecode.ScoredToken
import graft.model.SpanEnt
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class BioDecodeSpec extends AnyFunSuite {

  test("merge entities matches the reference's _merge_entities on 40 random cases") {
    val in = getClass.getResourceAsStream("/golden_merge.json")
    require(in != null)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    root.elements().asScala.foreach { c =>
      val input = c.get("input").elements().asScala.map { e =>
        SpanEnt(e.get("span").get(0).asInt(), e.get("span").get(1).asInt(),
          e.get("type").asText(), e.get("score").asDouble(), "bert")
      }.toSeq
      val got = BioDecode.mergeEntities(input)
      val want = c.get("merged").elements().asScala.toSeq
      assert(got.length == want.length, s"input=$input got=$got")
      got.zip(want).foreach { case (g, w) =>
        assert(g.start == w.get("start").asInt() && g.end == w.get("end").asInt()
          && g.typ == w.get("type").asText() && g.score == w.get("score").asDouble(),
          s"got=$g want=$w input=$input")
      }
    }
  }

  test("BIO decode: B starts, same-type I extends with max score, O closes") {
    val toks = Seq(
      ScoredToken(0, 0, "O", 0.9, special = true), // CLS
      ScoredToken(0, 4, "B-PER", 0.8),
      ScoredToken(5, 9, "I-PER", 0.95),
      ScoredToken(10, 12, "O", 0.5),
      ScoredToken(13, 17, "B-PHONE", 0.7),
      ScoredToken(18, 20, "I-EMAIL", 0.6), // type switch closes PHONE
      ScoredToken(21, 24, "B-LOC", 0.99),
      ScoredToken(0, 0, "O", 0.1, special = true) // SEP
    )
    val got = BioDecode.decode(toks, offset = 100)
    assert(got == List(
      SpanEnt(100, 109, "NAME", 0.95, "bert"),
      SpanEnt(113, 117, "PHONE", 0.7, "bert"),
      SpanEnt(121, 124, "ADDRESS", 0.99, "bert")))
  }

  test("decode: I without current entity is dropped; trailing entity flushed") {
    val got = BioDecode.decode(Seq(
      ScoredToken(0, 3, "I-PER", 0.9),
      ScoredToken(4, 8, "B-ORG", 0.8)))
    assert(got == List(SpanEnt(4, 8, "ORGANIZATION", 0.8, "bert")))
  }

  test("chunk starts use stride maxLen/2") {
    assert(BioDecode.chunkStarts(10, 512) == Seq(0))
    assert(BioDecode.chunkStarts(600, 512) == Seq(0, 256, 512))
    assert(BioDecode.chunkStarts(0, 512) == Seq(0))
  }
}
