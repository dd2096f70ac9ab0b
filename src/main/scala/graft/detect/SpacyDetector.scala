package graft.detect

import graft.model.SpanEnt

/** D8 — the legacy spaCy detector's dataflow
  * (`/root/reference/src/deid_pipeline/pii/detectors/legacy/spacy_detector.py:38-148`):
  * two passes bag-unioned and sorted by span start —
  *
  *  1. the NER pipeline's span entities filtered/renamed through
  *     `SPACY_TO_PII_TYPE` (`:13-27`), score 0.99, source "spacy" — the
  *     model leaf, behind a pluggable [[SpacyDetector.SpanNer]] exactly like
  *     the BERT scaffold's TokenScorer (no spaCy model ships here);
  *  2. the regex BACKSTOP (`:136-146`): every rule pattern's matches, score
  *     1.0, source "regex" — the same rule set as D1, re-run per pattern in
  *     rule order.
  *
  * Output sorted by start (`:148` — stable, preserving pass order on ties),
  * NOT conflict-resolved: like the reference, downstream composition (D7)
  * resolves overlaps.
  */
object SpacyDetector {

  /** `SPACY_TO_PII_TYPE` (`spacy_detector.py:13-27`). */
  val spacyToPiiType: Map[String, String] = Map(
    "PERSON" -> "NAME", "GPE" -> "ADDRESS", "LOC" -> "ADDRESS",
    "ORG" -> "ORGANIZATION", "PHONE" -> "PHONE", "ID" -> "ID",
    "PASSPORT" -> "PASSPORT", "UNIFIED_BUSINESS_NO" -> "UNIFIED_BUSINESS_NO",
    "EMAIL" -> "EMAIL", "ADDRESS" -> "ADDRESS", "MEDICAL_ID" -> "MEDICAL_ID")

  /** The model leaf: span-level NER (spaCy `doc.ents` analogue). */
  trait SpanNer extends Serializable {
    def ents(text: String): Seq[(Int, Int, String)] // (startCp, endCp, label)
  }

  /** No-model default: the NER pass contributes nothing; only the regex
    * backstop runs — the reference's effective behavior when the pipeline
    * has no NER component.
    */
  object NoModel extends SpanNer {
    def ents(text: String): Seq[(Int, Int, String)] = Nil
  }

  def detect(
      text: String,
      ner: SpanNer = NoModel,
      lang: String = "zh"
  ): List[SpanEnt] = {
    val fromNer = ner.ents(text).flatMap { case (s, e, label) =>
      spacyToPiiType.get(label).map(typ => SpanEnt(s, e, typ, 0.99, "spacy"))
    }
    // backstop: same rule regexes, all matches in rule order, score 1.0,
    // source "regex" (`:136-146`) ≡ the D1 scanner's raw emissions
    val backstop = Detectors.regexDetect(text, lang)
    (fromNer ++ backstop).sortBy(_.start).toList // stable sort = python sorted
  }
}
