package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.training.Synthetic
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class SyntheticSpec extends AnyFunSuite {

  test("synthetic span-example generator matches the reference bit-exactly") {
    val in = getClass.getResourceAsStream("/golden_synthetic.json")
    require(in != null)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    for (lang <- Seq("zh", "en"); seed <- Seq(0L, 42L)) {
      val want = root.get(s"${lang}_$seed").elements().asScala.toSeq
      val got = Synthetic.generate(numExamples = 25, seed = seed, language = lang)
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(g.text == w.get("text").asText(),
          s"$lang/$seed text mismatch:\n got=${g.text}\nwant=${w.get("text").asText()}")
        val wantEnts = w.get("entities").elements().asScala.toSeq
        assert(g.entities.length == wantEnts.length)
        g.entities.zip(wantEnts).foreach { case (ge, we) =>
          assert(ge.typ == we.get("type").asText() && ge.start == we.get("start").asInt()
            && ge.end == we.get("end").asInt() && ge.text == we.get("text").asText(),
            s"$lang/$seed entity: got=$ge want=$we")
        }
      }
    }
  }

  test("generated examples feed the detection pipeline (recall on injected PII)") {
    // the reference's recall gate (pii_test_suite.py:32-52) over synthetic
    // docs: regex detectors must re-find the injected span values
    val examples = Synthetic.generate(numExamples = 100, seed = 7, language = "zh")
    var total = 0
    var found = 0
    examples.foreach { ex =>
      val detected = graft.pipeline.DeidCore.detect(ex.text, "zh", withStub = false)
      ex.entities.filter(e => Set("PHONE", "EMAIL", "ID", "ADDRESS").contains(e.typ))
        .foreach { gold =>
          total += 1
          if (detected.exists(d => d.start <= gold.start && gold.end <= d.end))
            found += 1
        }
    }
    val recall = found.toDouble / total
    assert(recall >= 0.9, s"recall $recall ($found/$total)")
  }
}
