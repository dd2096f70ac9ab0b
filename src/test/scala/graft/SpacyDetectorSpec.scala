package graft

import graft.detect.{Detectors, SpacyDetector}
import graft.model.SpanEnt
import org.scalatest.funsuite.AnyFunSuite

/** D8 — the legacy detector's dataflow around the model-gated NER leaf. */
class SpacyDetectorSpec extends AnyFunSuite {

  private val text = "Hi, my ID is A123456789 and phone 0912-345-678."

  test("no-model path == regex backstop (D1 raw emissions) sorted by start") {
    val got = SpacyDetector.detect(text)
    val want = Detectors.regexDetect(text, "zh").sortBy(_.start).toList
    assert(got == want)
    assert(got.forall(e => e.source == "regex" && e.score == 1.0))
  }

  test("NER spans map through SPACY_TO_PII_TYPE; unknown labels dropped") {
    val ner = new SpacyDetector.SpanNer {
      def ents(t: String): Seq[(Int, Int, String)] =
        Seq((0, 2, "PERSON"), (4, 6, "DATE" /* unmapped */), (7, 9, "GPE"),
          (10, 12, "MEDICAL_ID"))
    }
    val got = SpacyDetector.detect("xx yy zz aa bb", ner)
    assert(got == List(
      SpanEnt(0, 2, "NAME", 0.99, "spacy"),
      SpanEnt(7, 9, "ADDRESS", 0.99, "spacy"),
      SpanEnt(10, 12, "MEDICAL_ID", 0.99, "spacy")))
    // all 11 reference labels present (spacy_detector.py:13-27)
    assert(SpacyDetector.spacyToPiiType.size == 11)
    assert(SpacyDetector.spacyToPiiType("MEDICAL_ID") == "MEDICAL_ID")
  }

  test("both passes merge sorted by start, NER-first on ties (python sorted)") {
    val ner = new SpacyDetector.SpanNer {
      def ents(t: String): Seq[(Int, Int, String)] = Seq((13, 23, "PERSON"))
    }
    val got = SpacyDetector.detect(text, ner)
    // raw bag union — overlapping rule matches kept (ID/PASSPORT/MEDICAL_ID
    // all fire on A123456789); NER entity first on the start tie
    val at13 = got.filter(_.start == 13)
    assert(at13.map(_.source) == List("spacy", "regex", "regex", "regex"), at13)
    assert(at13.head.typ == "NAME")
    assert(got == got.sortBy(_.start))
    // composes with the D7 resolver like any other detector stack
    val resolved = graft.detect.Resolver.resolve(got.toArray)
    assert(resolved.nonEmpty)
  }
}
