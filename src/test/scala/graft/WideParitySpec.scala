package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.pipeline.DeidCore
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** 1,680 randomized parity cases (tools/gen_wide_golden.py): seeded-random
  * compositions of PII values, CJK/ASCII filler, adjacency torture — clean
  * text and resolved spans must match the reference byte-for-byte.
  */
class WideParitySpec extends AnyFunSuite {

  test("wide randomized battery: clean text + resolved spans match the reference") {
    val in = getClass.getResourceAsStream("/golden_deid_wide.json")
    require(in != null)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    var n = 0
    root.elements().asScala.foreach { c =>
      val text = c.get("text").asText()
      val lang = c.get("lang").asText()
      val mode = c.get("mode").asText()
      val r = DeidCore.process(text, mode = mode, lang = lang)
      assert(r.text == c.get("clean").asText(),
        s"clean mismatch lang=$lang mode=$mode text=${text.take(120)}\n got=${r.text}\nwant=${c.get("clean").asText()}")
      val wantSpans = c.get("spans").elements().asScala
        .map(s => (s.get(0).asInt(), s.get(1).asInt(), s.get(2).asText())).toSeq
      val gotSpans = r.entities.map(e => (e.start, e.end, e.typ))
      assert(gotSpans == wantSpans,
        s"span mismatch lang=$lang text=${text.take(120)}\n got=$gotSpans\nwant=$wantSpans")
      n += 1
    }
    info(s"$n cases verified")
    assert(n > 1500)
  }
}
