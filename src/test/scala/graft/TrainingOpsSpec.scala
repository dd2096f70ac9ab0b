package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.training._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Parity with fixtures produced by RUNNING the reference's training modules
  * (tools/gen_training_golden.py → golden_training.json).
  */
class TrainingOpsSpec extends AnyFunSuite {

  private val root: JsonNode = {
    val in = getClass.getResourceAsStream("/golden_training.json")
    require(in != null)
    try new ObjectMapper().readTree(in) finally in.close()
  }

  test("P6 canonicalize_entity_type parity (exact map + 16 heuristics)") {
    root.get("canonical").elements().asScala.foreach { c =>
      val raw = c.get("raw").asText()
      val want = Option(c.get("canon")).filterNot(_.isNull).map(_.asText())
      assert(Canonical.canonicalizeEntityType(raw) == want, s"raw=$raw")
    }
    root.get("normalize_raw").elements().asScala.foreach { c =>
      assert(Canonical.normalizeRawEntityType(c.get("raw").asText()) ==
        c.get("norm").asText(), s"raw=${c.get("raw").asText()}")
    }
  }

  test("D10 markup extraction + R7 masking parity") {
    root.get("markup").elements().asScala.foreach { c =>
      val text = c.get("text").asText()
      val fmt = Option(c.get("fmt")).filterNot(_.isNull).map(_.asText())
      assert(PiiMarkup.detectMarkupFormat(text) == fmt, s"fmt of $text")
      val got = PiiMarkup.extractPiiBlocks(text)
      val want = c.get("blocks").elements().asScala.toSeq
      assert(got.length == want.length, s"blocks of $text: $got")
      got.zip(want).foreach { case (g, w) =>
        assert(g.piiType == w.get("type").asText() && g.value == w.get("value").asText()
          && g.valueStart == w.get("vs").asInt() && g.valueEnd == w.get("ve").asInt()
          && g.blockStart == w.get("bs").asInt() && g.blockEnd == w.get("be").asInt(),
          s"block mismatch for $text: got=$g want=$w")
      }
      assert(PiiMarkup.maskPiiBlocks(text, got) == c.get("masked").asText())
      assert(PiiMarkup.maskPiiBlocks(text, got, "▮") == c.get("masked_ph").asText())
    }
  }

  test("P7 placeholder canonicalization + R6 span placeholderization parity") {
    root.get("placeholders").elements().asScala.foreach { c =>
      assert(Placeholders.canonicalizePlaceholderText(c.get("text").asText()) ==
        c.get("canon").asText(), s"text=${c.get("text").asText()}")
    }
    val rs = root.get("replace_spans")
    val ents = rs.get("entities").elements().asScala.map { e =>
      (e.get("span").get(0).asInt(), e.get("span").get(1).asInt(),
        e.get("type").asText())
    }.toSeq
    assert(Placeholders.replaceSpansWithPlaceholders(rs.get("text").asText(), ents) ==
      rs.get("result").asText())
  }

  test("D11 masked-pair gold-span recovery parity") {
    root.get("masked_pairs").elements().asScala.foreach { c =>
      val got = MaskedPairs.extractEntitiesFromMaskedPair(
        c.get("orig").asText(), c.get("masked").asText())
      val want = c.get("entities").elements().asScala.toSeq
      assert(got.length == want.length,
        s"orig=${c.get("orig").asText()} got=$got")
      got.zip(want).foreach { case (g, w) =>
        assert(g.typ == w.get("type").asText() && g.start == w.get("start").asInt()
          && g.end == w.get("end").asInt() && g.text == w.get("text").asText(),
          s"got=$g want=$w")
      }
    }
  }

  test("F9/F10 BIO labels + alignment parity") {
    val t = root.get("tokenization")
    val wantLabels = t.get("labels").elements().asScala.map(_.asText()).toList
    val gotLabels = Tokenization.buildBioLabelList(
      Seq("PHONE", "NAME", "EMAIL", "NAME", ""))
    assert(gotLabels == wantLabels)
    val labelToId = gotLabels.zipWithIndex.toMap
    val got = Tokenization.alignEntitiesToTokens(
      Seq((5, 12, "NAME"), (13, 20, "PHONE")),
      Seq((0, 0), (0, 4), (5, 10), (10, 12), (13, 20), (0, 0)),
      labelToId)
    val want = t.get("aligned").elements().asScala.map(_.asInt()).toList
    assert(got == want)
  }

  test("O2 python shuffle + O4 reservoir parity") {
    val items = (0 until 17).map(i => s"e$i")
    val got = Mix.mixShuffle(Seq(items), seed = 42)
    val want = root.get("mix_shuffle").get("result")
      .elements().asScala.map(_.asText()).toList
    assert(got == want)

    val res = Mix.reservoirSample((0 until 100).iterator, k = 10, seed = 7)
    val wantRes = root.get("reservoir").get("result")
      .elements().asScala.map(_.asInt()).toList
    assert(res == wantRes)
  }
}
