package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.functions.SeqMatcher
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class SeqMatcherSpec extends AnyFunSuite {
  test("ratio matches CPython difflib on golden vectors (incl. autojunk)") {
    val in = getClass.getResourceAsStream("/golden_seqmatcher.json")
    require(in != null)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    root.elements().asScala.foreach { c =>
      val a = c.get("a").asText()
      val b = c.get("b").asText()
      val want = c.get("ratio").asDouble()
      val got = SeqMatcher.ratio(a, b)
      assert(got == want, s"a=${a.take(40)} b=${b.take(40)} got=$got want=$want")
    }
  }
}
