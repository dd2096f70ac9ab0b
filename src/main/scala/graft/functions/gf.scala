package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.Bridge.{column, expression}

/** Column DSL over the custom Catalyst expressions — the library's public
  * function surface (analogue of `org.apache.spark.sql.functions`).
  */
object gf {

  /** Regex PII detection (D1/D2/D7). `resolve=true` applies composite
    * conflict resolution; `withStub` adds the model-stub patterns first.
    */
  def regexDetect(
      text: Column,
      lang: String = "zh",
      withStub: Boolean = false,
      resolve: Boolean = true
  ): Column =
    column(RegexDetectExpr(expression(text), lang, withStub, resolve))

  /** Aho–Corasick gazetteer detection. */
  def dictDetect(text: Column): Column =
    column(DictDetectExpr(expression(text)))

  /** Full per-turn pipeline: (html extract?) → detect → resolve → redact.
    * Returns struct<text, entities, events, replacement_map>.
    */
  def deid(
      text: Column,
      mode: String = "replace",
      lang: String = "zh",
      withStub: Boolean = false,
      extractHtml: Boolean = true
  ): Column =
    column(DeidTurnExpr(expression(text), mode, lang, withStub, extractHtml))

  /** bs4 `get_text("\n")`-parity HTML strip. */
  def htmlText(html: Column): Column = column(HtmlTextExpr(expression(html)))

  /** Boilerplate-scored main content. */
  def htmlMain(html: Column): Column = column(HtmlMainExpr(expression(html)))

  /** `\S+` tokens with code-point offsets. */
  def tokensWithOffsets(text: Column): Column =
    column(TokensWithOffsetsExpr(expression(text)))

  /** 64-bit SimHash document signature. */
  def simhash64(text: Column): Column = column(SimHash64Expr(expression(text)))

  /** single-pass MinHash signature (numHashes longs) over k-word shingles. */
  def minhashSig(text: Column, numHashes: Int = 64, k: Int = 3): Column =
    column(MinHashSigExpr(expression(text), numHashes, k))

  /** difflib `SequenceMatcher.ratio()` parity (G4). */
  def seqRatio(a: Column, b: Column): Column =
    column(SeqMatcherRatioExpr(expression(a), expression(b)))

  /** char-3-gram repetition rate (G7). */
  def rep3gram(text: Column): Column = column(Rep3GramExpr(expression(text)))

  /** primitive-loop cosine similarity over two array<double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    column(CosineSimExpr(expression(a), expression(b)))

  /** all sign-bit LSH table buckets in one pass (array<long>, one per table). */
  def lshBuckets(vec: Column, planes: Seq[Seq[Double]], bits: Int): Column =
    column(LshBucketsExpr(expression(vec), planes, bits))

  /** top-nprobe nearest centroid ids by cosine (IVF coarse quantizer). */
  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    column(NearestCentroidsExpr(expression(vec), centroids, nprobe))

  /** layout-ordered PDF text extraction over a binary column. */
  def pdfText(pdf: Column): Column = column(PdfTextExpr(expression(pdf)))

  /** per-page PDF extraction with the S5 OCR-fallback trigger flag. */
  def pdfPages(pdf: Column): Column = column(PdfPagesExpr(expression(pdf)))

  /** whole-document PDF black-box redaction (A2/K3): struct<pdf, n_rects>. */
  def pdfRedact(pdf: Column, lang: String = "zh"): Column =
    column(PdfRedactExpr(expression(pdf), lang))

  /** whole-document CSV rewrite (K2): struct<csv, n_entities>. */
  def csvDeid(csv: Column, mode: String = "replace", lang: String = "zh"): Column =
    column(CsvDeidExpr(expression(csv), mode, lang))

  /** XLSX cell extraction over a binary workbook column (S9). */
  def xlsxText(xlsx: Column): Column = column(XlsxTextExpr(expression(xlsx)))

  /** whole-workbook XLSX rewrite: struct<xlsx, n_entities>. */
  def xlsxDeid(xlsx: Column, mode: String = "replace", lang: String = "zh"): Column =
    column(XlsxDeidExpr(expression(xlsx), mode, lang))

  /** deterministic synthetic workbook from text (fixtures/bench). */
  def xlsxSynth(text: Column): Column = column(XlsxSynthExpr(expression(text)))

  /** DOCX/PPTX extraction over a binary column (S8/S10). */
  def officeText(doc: Column, format: String): Column =
    column(OfficeTextExpr(expression(doc), format))

  /** DOCX/PPTX replace-all rebuild: struct<doc, n_entities>. */
  def officeDeid(doc: Column, format: String, mode: String = "replace",
      lang: String = "zh"): Column =
    column(OfficeDeidExpr(expression(doc), format, mode, lang))

  /** deterministic synthetic DOCX/PPTX from text (fixtures/bench). */
  def officeSynth(text: Column, format: String): Column =
    column(OfficeSynthExpr(expression(text), format))

  /** deterministic synthetic PDF payload from text (fixtures/bench). */
  def pdfSynth(text: Column): Column = column(PdfSynthExpr(expression(text)))

  def pdfRewrite(pdf: Column, lang: String = "zh"): Column =
    column(PdfRewriteExpr(expression(pdf), lang))

  /** D10 — PII-markup block extraction with value/block spans. */
  def piiMarkup(text: Column): Column =
    column(PiiMarkupExtractExpr(expression(text)))

  /** D11 — gold spans recovered from an (original, masked) pair. */
  def maskedPairRecover(orig: Column, masked: Column): Column =
    column(MaskedPairRecoverExpr(expression(orig), expression(masked)))

  /** R6 — detected spans replaced with `<TYPE>` placeholders. */
  def placeholderize(text: Column, lang: String = "zh"): Column =
    column(PlaceholderizeExpr(expression(text), lang))

  /** A1 end-to-end on a CSV document: extract → detect → anchor attach. */
  def csvAnchoredDetect(csv: Column, lang: String = "zh"): Column =
    column(CsvAnchoredDetectExpr(expression(csv), lang))

  /** P6 — canonical entity-type mapping (null when unmappable). */
  def canonicalType(raw: Column): Column =
    column(CanonicalTypeExpr(expression(raw)))

  /** all k-token windows (token span, char span, sha2 digest) in one pass. */
  def tokenWindows(text: Column, k: Int): Column =
    column(TokenWindowsExpr(expression(text), k))

  /** k-word shingles (lowercased, whitespace-split) — compact expression
    * pinned bit-equal to the HOF formulation (OpsSpec).
    */
  def shingles(text: Column, k: Int): Column =
    column(ShinglesExpr(expression(text), k))

  /** sorted ROOT-lowercased token multiset — the SimHash verify/keeper key
    * (same lowering as the signature; see [[TokenMultisetKeyExpr]]).
    */
  def tokenMultisetKey(text: Column): Column =
    column(TokenMultisetKeyExpr(expression(text)))

  /** Product-quantization codes (integer-exact contract; see
    * [[graft.ops.Pq]]).
    */
  def pqEncode(vec: Column, codebook: Seq[Seq[Seq[Int]]]): Column =
    column(PqEncodeExpr(expression(vec), codebook))

  /** Per-query ADC lookup table (nsub·ncent exact BIGINT distances). */
  def pqLut(vec: Column, codebook: Seq[Seq[Seq[Int]]]): Column =
    column(PqLutExpr(expression(vec), codebook))

  /** ADC score: Σ over subspaces of lut[s·ncent + codes[s]]. */
  def pqAdc(codes: Column, lut: Column, ncent: Int): Column =
    column(PqAdcExpr(expression(codes), expression(lut), ncent))
}
