package graft

import graft.extract.Ocr
import org.scalatest.funsuite.AnyFunSuite

/** S6 dataflow parity (`ocr.py:95-170`, `image.py:20-43`) around the
  * stubbed engine leaf.
  */
class OcrSpec extends AnyFunSuite {

  test("threshold normalization is engine-specific (ocr.py:95-106)") {
    assert(Ocr.normalizeThreshold("easyocr", 60.0) == 0.6)
    assert(Ocr.normalizeThreshold("easyocr", 0.6) == 0.6)
    assert(Ocr.normalizeThreshold("tesseract", 0.6) == 60.0)
    assert(Ocr.normalizeThreshold("tesseract", 60.0) == 60.0)
  }

  test("tesseract path strips text, skips empties BEFORE the conf check") {
    val blocks = Seq(
      Ocr.OcrBlock("  hello ", 0, 0, 10, 5, 90),
      Ocr.OcrBlock("   ", 10, 0, 5, 5, 99), // empty after strip → dropped
      Ocr.OcrBlock("weak", 20, 0, 5, 5, 30)) // sub-threshold → dropped
    val kept = Ocr.filterBlocks(blocks, "tesseract", 60.0)
    assert(kept == Seq(Ocr.OcrBlock("hello", 0, 0, 10, 5, 90)))
    assert(Ocr.fullText(kept) == "hello")
  }

  test("easyocr path keeps text verbatim, compares in [0,1]") {
    val blocks = Seq(
      Ocr.OcrBlock(" spaced ", 0, 0, 10, 5, 0.9),
      Ocr.OcrBlock("weak", 10, 0, 5, 5, 0.3))
    val kept = Ocr.filterBlocks(blocks, "easyocr", 60.0) // normalized to 0.6
    assert(kept == Seq(Ocr.OcrBlock(" spaced ", 0, 0, 10, 5, 0.9)))
  }

  test("image-handler segments: bbox anchors, space separator, PII flows to detect") {
    val payload =
      """ID|10|20|100|12|95
        |A123456789|120|20|80|12|88
        |garbage|0|40|10|10|20
        |""".stripMargin.getBytes("UTF-8")
    val doc = Ocr.extract(payload, Ocr.StubRecognizer("tesseract"))
    assert(doc.text == "ID A123456789")
    assert(doc.segments.length == 2)
    assert(doc.segments(1).bbox.contains(Seq(120, 20, 200, 32)))
    // the concatenated text feeds the ordinary detect path
    val ents = graft.pipeline.DeidCore.detect(doc.text, "zh", withStub = false)
    assert(ents.exists(_.typ == "ID"))
    // anchor attaches to the block segment
    val e = ents.find(_.typ == "ID").get
    val entity = graft.model.Entity(e.typ, e.score, e.score, e.source, "zh",
      e.start, e.end, "A123456789")
    val seg = graft.extract.Segments.anchorOf(entity, doc.segments)
    assert(seg.exists(_.bbox.contains(Seq(120, 20, 200, 32))))
  }

  test("K4 image rects: entity_bbox preferred, segment_overlap fallback, dedupe") {
    import graft.extract.ImageRedact
    val payload =
      """hello|0|0|40|12|95
        |A123456789|50|0|80|12|90
        |world|140|0|40|12|92
        |""".stripMargin.getBytes("UTF-8")
    val doc = Ocr.extract(payload, Ocr.StubRecognizer("tesseract"))
    // entity with its own bbox anchor wins, strategy entity_bbox
    val withBbox = ImageRedact.resolveRects(
      Seq(ImageRedact.Ent("ID", 0, 5, bbox = Some(Seq(1, 2, 3, 4)))), doc.segments)
    assert(withBbox == Seq(ImageRedact.Rect(0, 1, 2, 3, 4, "ID", "entity_bbox")))
    // span-only entity over "A123456789" (offsets 6..16 in "hello A... world")
    val overlap = ImageRedact.resolveRects(
      Seq(ImageRedact.Ent("ID", 6, 16)), doc.segments)
    assert(overlap.map(_.strategy) == Seq("segment_overlap"))
    assert(overlap.head.left == 50 && overlap.head.right == 130)
    assert(overlap.head.segmentId.contains(1))
    // duplicate rect across entities deduped (reference `seen` set)
    val dup = ImageRedact.resolveRects(
      Seq(ImageRedact.Ent("ID", 6, 16), ImageRedact.Ent("PHONE", 8, 12)),
      doc.segments)
    assert(dup.length == 1 && dup.head.entityType == "ID")
    // span crossing two segments emits both rects
    val two = ImageRedact.resolveRects(
      Seq(ImageRedact.Ent("X", 3, 8)), doc.segments)
    assert(two.map(_.segmentId.get) == Seq(0, 1))
    // malformed bbox (truthy, wrong arity): reference `continue`s — the
    // entity is skipped ENTIRELY, no segment_overlap fallback (image.py:69-72)
    val malformed = ImageRedact.resolveRects(
      Seq(ImageRedact.Ent("ID", 6, 16, bbox = Some(Seq(1, 2, 3)))), doc.segments)
    assert(malformed.isEmpty)
    // empty bbox list is falsy → segment_overlap path, like bbox = None
    val emptyBbox = ImageRedact.resolveRects(
      Seq(ImageRedact.Ent("ID", 6, 16, bbox = Some(Nil))), doc.segments)
    assert(emptyBbox.map(_.strategy) == Seq("segment_overlap"))
  }

  test("no blocks survive → one segment holding the (empty) full text") {
    val doc = Ocr.extract(Array.emptyByteArray, Ocr.StubRecognizer())
    assert(doc.segments.length == 1 && doc.text == "")
  }
}
