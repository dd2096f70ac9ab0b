package graft.training

import graft.functions.{Digests, FakeProvider, PyRandom}

import java.util.regex.Pattern

/** Port of the rewriter-corpus dataflow
  * (`/root/reference/src/deid_pipeline/training/rewriter.py` +
  * `scripts/prepare_rewriter_corpus.py:81-115`) — the LAST piece of the
  * reference's training side that was carried as a "GPT-2-gated skip": on
  * inspection the module is pure dataflow (no model anywhere) — placeholder
  * filling with the deterministic fake provider, seeded punctuation/space
  * noise, and prompt-pair construction for rewriter fine-tuning.
  * Byte-parity with the seeded reference via RewriterSpec goldens.
  */
object Rewriter {

  /** `PUNCT_SWAP` (rewriter.py:16-25). */
  val punctSwap: Map[Char, Char] = Map(
    '，' -> ',', ',' -> '，', '。' -> '.', '.' -> '。',
    '：' -> ':', ':' -> '：', '；' -> ';', ';' -> '；')

  /** `hash16` (rewriter.py:28-29). */
  def hash16(text: String): String =
    Digests.sha256Hex(Option(text).getOrElse("")).take(16)

  private val PlaceholderRe: Pattern =
    Pattern.compile("([<\\[{])([A-Za-z_]+?)(?:_?\\d+)?([>\\]}])")

  /** `fill_placeholders_with_fake_values` (rewriter.py:33-63): each `<TYPE>`
    * placeholder becomes the deterministic fake value for
    * (canonical type, "rawType:idx", context hash).
    */
  def fillPlaceholders(
      text: String,
      contextHash: String,
      unknownEntityType: String = "PII"): String = {
    val raw = Option(text).getOrElse("")
    val m = PlaceholderRe.matcher(raw)
    val sb = new java.lang.StringBuilder
    var cursor = 0
    var idx = 0
    while (m.find()) {
      sb.append(raw, cursor, m.start())
      val rawType = Option(m.group(2)).getOrElse("")
      val entType = Canonical.canonicalizeEntityType(rawType, unknownEntityType)
        .getOrElse(unknownEntityType)
      val original = s"$rawType:$idx"
      sb.append(FakeProvider.generateDeterministic(entType, original, contextHash))
      cursor = m.end()
      idx += 1
    }
    sb.append(raw, cursor, raw.length)
    sb.toString
  }

  /** Python `str.strip()` (Unicode whitespace both ends). */
  private def stripPy(s: String): String =
    s.replaceAll("(?U)^\\s+|\\s+$", "")

  /** `make_noisy` (rewriter.py:66-88) — draw order is load-bearing: swap?,
    * then space?, then dup? per swap-able char; one final draw picks the
    * double-space direction.
    */
  def makeNoisy(
      text: String,
      rng: PyRandom,
      punctProb: Double = 0.35,
      spaceProb: Double = 0.25,
      dupProb: Double = 0.08): String = {
    val out = new java.lang.StringBuilder
    Option(text).getOrElse("").foreach { c0 =>
      var ch = c0
      if (punctSwap.contains(ch) && rng.random() < punctProb) ch = punctSwap(ch)
      out.append(ch)
      if (punctSwap.contains(ch) && rng.random() < spaceProb) out.append(' ')
      if (punctSwap.contains(ch) && rng.random() < dupProb) out.append(ch)
    }
    val noisy = out.toString
    val spaced =
      if (rng.random() < 0.5) noisy.replace("  ", " ") else noisy.replace(" ", "  ")
    stripPy(spaced)
  }

  /** `build_prompt` (rewriter.py:91-103). */
  def buildPrompt(noisy: String, clean: String, language: String): String =
    if (language == "zh")
      "Rewrite the following de-identified Chinese text to be fluent and natural. " +
        "Preserve all replacement values exactly.\n" +
        s"INPUT: $noisy\nOUTPUT: $clean\n"
    else
      "Rewrite the following de-identified text to be fluent and natural. " +
        "Preserve all replacement values exactly.\n" +
        s"INPUT: $noisy\nOUTPUT: $clean\n"

  /** The corpus-prep per-item block (prepare_rewriter_corpus.py:96-113):
    * canonicalize placeholders → ctx hash → fill → strip → length/CJK
    * filters → noise → prompt. Returns None when a filter drops the row.
    */
  def preparePair(
      rawText: String,
      rng: PyRandom,
      language: String,
      minChars: Int = 0,
      filterCjk: Boolean = false,
      punctProb: Double = 0.35,
      spaceProb: Double = 0.25,
      dupProb: Double = 0.08): Option[String] = {
    val placeholderText = Placeholders.canonicalizePlaceholderText(rawText)
    val ctx = hash16(placeholderText)
    val clean = stripPy(fillPlaceholders(placeholderText, ctx))
    if (minChars > 0 && clean.length < minChars) return None
    if ((filterCjk || language == "zh") && !Placeholders.containsCjk(clean)) return None
    val noisy = makeNoisy(clean, rng, punctProb, spaceProb, dupProb)
    Some(buildPrompt(noisy, clean, language))
  }

  /** The corpus-prep script as a distributed job: one narrow mapPartitions,
    * per-row noise seeding (`seedBase + id` — the script threads ONE RNG
    * through a sequential loop, which cannot parallelize; per-row seeding is
    * the distributed equivalent, each row's internal draw order unchanged).
    * Input: (id: long, text: string). Output: (id, prompt) minus filtered
    * rows.
    */
  def prepareCorpus(
      spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame,
      language: String,
      seedBase: Long = 0L,
      minChars: Int = 0,
      filterCjk: Boolean = false): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    df.select("id", "text").as[(Long, String)].mapPartitions { rows =>
      rows.flatMap { case (id, text) =>
        val rng = graft.functions.PyRandom.threadLocal(seedBase + id)
        preparePair(text, rng, language, minChars, filterCjk).map(p => (id, p))
      }
    }.toDF("id", "prompt")
  }
}
