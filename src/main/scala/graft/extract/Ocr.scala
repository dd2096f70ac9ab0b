package graft.extract

/** S6 — the OCR extraction DATAFLOW
  * (`/root/reference/src/deid_pipeline/parser/ocr.py:63-189`,
  * `handlers/image.py:14-43`), with the OCR engine behind a pluggable
  * [[Ocr.Recognizer]]. No OCR engine (tesseract/easyocr) or image codec
  * ships in this environment — like the model detector's TokenScorer, the
  * recognizer leaf is a documented stub; everything around it is the
  * reference's observable logic and is spec-pinned:
  *
  *  - engine-specific confidence-threshold normalization
  *    (`ocr.py:95-106`): EasyOCR scores in [0,1], Tesseract in [0,100];
  *  - block filtering (`ocr.py:125-137,160-170`): Tesseract block text is
  *    stripped and empty text skipped BEFORE the confidence check; EasyOCR
  *    text kept verbatim;
  *  - full text = kept block texts joined with " ", stripped;
  *  - image-handler segment construction (`image.py:20-43`): one segment
  *    per kept block with `bbox=(left, top, left+width, top+height)`,
  *    page_index 0, separator " "; a no-block result degrades to one
  *    segment holding the full text.
  */
object Ocr {

  /** `OCRTextBlock` (`parser/ocr.py:15-23`). */
  final case class OcrBlock(
      text: String, left: Int, top: Int, width: Int, height: Int, conf: Double)

  /** The engine leaf. Implementations must be Serializable; heavy state
    * (a tesseract handle) belongs in `@transient lazy val` per executor.
    */
  trait Recognizer extends Serializable {
    def engine: String // "tesseract" | "easyocr"
    def recognize(image: Array[Byte]): Seq[OcrBlock] // raw, pre-filter
  }

  /** `OCR_CONFIDENCE_THRESHOLD` (`config.py:95`). */
  val defaultConfidenceThreshold = 60.0

  /** `_confidence_threshold` (`ocr.py:95-106`). */
  def normalizeThreshold(engine: String, threshold: Double): Double =
    if (engine == "easyocr" && threshold > 1) threshold / 100.0
    else if (engine == "tesseract" && threshold <= 1) threshold * 100.0
    else threshold

  /** Engine-faithful keep/normalize pass over raw blocks. */
  def filterBlocks(
      blocks: Seq[OcrBlock],
      engine: String,
      threshold: Double = defaultConfidenceThreshold
  ): Seq[OcrBlock] = {
    val th = normalizeThreshold(engine, threshold)
    if (engine == "tesseract")
      blocks.flatMap { b =>
        val t = b.text.trim
        if (t.isEmpty) None // empty skipped BEFORE conf (ocr.py:127-129)
        else if (b.conf < th) None
        else Some(b.copy(text = t))
      }
    else blocks.filter(_.conf >= th) // easyocr keeps text verbatim (ocr.py:163-165)
  }

  /** `(full_text, blocks)` contract of `recognize` (`ocr.py:137,170`). */
  def fullText(kept: Seq[OcrBlock]): String =
    kept.map(_.text).mkString(" ").trim

  /** `ImageHandler.extract` segments (`image.py:20-43`). */
  def toDoc(kept: Seq[OcrBlock]): Segments.Doc = {
    val specs = kept.flatMap { b =>
      val t = b.text.trim
      if (t.isEmpty) None
      else Some(Segments.Spec(t, pageIndex = Some(0),
        bbox = Some(Seq(b.left, b.top, b.left + b.width, b.top + b.height))))
    }
    Segments.build(
      if (specs.nonEmpty) specs else Seq(Segments.Spec(fullText(kept))), " ")
  }

  /** Deterministic stub recognizer: the "image" payload is a UTF-8 grid of
    * `text|left|top|width|height|conf` lines — stands in for the engine the
    * sandbox cannot ship while keeping the dataflow real and testable.
    */
  final case class StubRecognizer(engine: String = "tesseract") extends Recognizer {
    def recognize(image: Array[Byte]): Seq[OcrBlock] =
      new String(image, java.nio.charset.StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty).flatMap { line =>
          line.split("\\|") match {
            case Array(t, l, top, w, h, c) =>
              Some(OcrBlock(t, l.toInt, top.toInt, w.toInt, h.toInt, c.toDouble))
            case _ => None
          }
        }
  }

  /** Full S6 pipeline for one image: recognize → filter → segments. */
  def extract(
      image: Array[Byte],
      recognizer: Recognizer,
      threshold: Double = defaultConfidenceThreshold
  ): Segments.Doc =
    toDoc(filterBlocks(recognizer.recognize(image), recognizer.engine, threshold))
}
