package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.detect.Detectors
import graft.functions.FakeProvider
import graft.pipeline.DeidCore
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Byte-for-byte parity against fixtures produced by RUNNING the reference
  * pipeline's golden path (tools/gen_golden.py → golden_deid.json):
  * regex-only composite detector, MT19937 fallback replacement, zh + en.
  */
class GoldenParitySpec extends AnyFunSuite {

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/golden_deid.json")
    require(in != null, "golden_deid.json missing from test resources")
    try new ObjectMapper().readTree(in)
    finally in.close()
  }

  test("fake provider matches all reference vectors") {
    root.get("fake_provider").elements().asScala.foreach { v =>
      val got = FakeProvider.generateDeterministic(
        v.get("type").asText(),
        v.get("original").asText(),
        v.get("ctx").asText()
      )
      assert(got == v.get("value").asText(),
        s"type=${v.get("type").asText()} original=${v.get("original").asText()}")
    }
  }

  test("raw regex detection matches the reference (spans, order, type, source)") {
    root.get("raw_detect").elements().asScala.foreach { c =>
      val text = c.get("text").asText()
      val lang = c.get("lang").asText()
      val got = Detectors.regexDetect(text, lang)
      val want = c.get("raw").elements().asScala.toSeq
      assert(got.length == want.length, s"count mismatch lang=$lang text=$text: " +
        s"got=${got.mkString(",")} want=${want.mkString(",")}")
      got.zip(want).foreach { case (g, w) =>
        assert(g.start == w.get("start").asInt() && g.end == w.get("end").asInt()
          && g.typ == w.get("type").asText() && g.source == w.get("source").asText(),
          s"lang=$lang text=$text got=$g want=$w")
      }
    }
  }

  test("full pipeline (detect→resolve→redact) matches the reference") {
    root.get("pipeline").elements().asScala.foreach { c =>
      val text = c.get("text").asText()
      val lang = c.get("lang").asText()
      val mode = c.get("mode").asText()
      val r = DeidCore.process(text, mode = mode, lang = lang)

      assert(r.text == c.get("clean").asText(),
        s"clean text mismatch lang=$lang mode=$mode text=$text\n got=${r.text}")

      val wantEnts = c.get("entities").elements().asScala.toSeq
      assert(r.entities.length == wantEnts.length,
        s"entity count lang=$lang mode=$mode text=$text got=${r.entities}")
      r.entities.zip(wantEnts).foreach { case (g, w) =>
        assert(g.typ == w.get("type").asText() && g.start == w.get("start").asInt()
          && g.end == w.get("end").asInt() && g.score == w.get("score").asDouble()
          && g.source == w.get("source").asText() && g.text == w.get("text").asText(),
          s"entity mismatch lang=$lang text=$text got=$g want=$w")
      }

      val wantEvents = c.get("events").elements().asScala.toSeq
      assert(r.events.length == wantEvents.length,
        s"event count lang=$lang mode=$mode text=$text got=${r.events}")
      r.events.zip(wantEvents).foreach { case (g, w) =>
        assert(g.entity_type == w.get("entity_type").asText()
          && g.original == w.get("original").asText()
          && g.replacement == w.get("replacement").asText()
          && g.start == w.get("span").get(0).asInt()
          && g.end == w.get("span").get(1).asInt()
          && g.source == w.get("source").asText(),
          s"event mismatch lang=$lang text=$text got=$g want=$w")
      }

      val wantMap = c.get("replacement_map").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
      assert(r.replacementMap == wantMap, s"map mismatch lang=$lang text=$text")
    }
  }
}
