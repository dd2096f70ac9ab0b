package graft.training

import graft.detect.CpOffsets
import graft.functions.{PyRandom, SeqMatcher}

import java.util.regex.Pattern
import scala.collection.mutable

/** Training/eval-side dataflow operators (SURVEY §2.3 D10–D11, §2.2 P6–P9,
  * §2.4 R6–R7, §2.7 O2/O4/O6, §2.8 F9–F10) — per-row pure functions cloned
  * from the reference's `src/deid_pipeline/training` package. All offsets are code
  * points (Python string semantics).
  */
object Canonical {

  /** `CANONICAL_ENTITY_TYPES` (`training/canonical.py:13-33`). */
  val canonicalTypes: IndexedSeq[String] = IndexedSeq(
    "NAME", "USERNAME", "EMAIL", "PHONE", "ID", "PASSPORT", "MEDICAL_ID",
    "UNIFIED_BUSINESS_NO", "ADDRESS", "ORGANIZATION", "DATE", "TIME",
    "IP_ADDRESS", "URL", "CREDIT_CARD", "BANK_ACCOUNT", "LICENSE_PLATE",
    "AGE", "PII")

  /** `EXACT_TYPE_MAP` (`canonical.py:36-108`) — all 73 entries. */
  val exactTypeMap: Map[String, String] = Map(
    "PER" -> "NAME", "PERSON" -> "NAME", "NAME" -> "NAME",
    "FULLNAME" -> "NAME", "FULL_NAME" -> "NAME", "FIRSTNAME" -> "NAME",
    "FIRST_NAME" -> "NAME", "GIVENNAME" -> "NAME", "GIVEN_NAME" -> "NAME",
    "LASTNAME" -> "NAME", "LAST_NAME" -> "NAME", "SURNAME" -> "NAME",
    "MIDDLE_NAME" -> "NAME", "PATIENT_NAME" -> "NAME", "DOCTOR_NAME" -> "NAME",
    "USERNAME" -> "USERNAME", "USER_NAME" -> "USERNAME", "HANDLE" -> "USERNAME",
    "EMAIL" -> "EMAIL", "EMAIL_ADDRESS" -> "EMAIL",
    "PHONE" -> "PHONE", "PHONE_NUMBER" -> "PHONE", "MOBILE" -> "PHONE",
    "TEL" -> "PHONE", "FAX" -> "PHONE",
    "ID" -> "ID", "SSN" -> "ID", "NATIONAL_ID" -> "ID", "DRIVER_LICENSE" -> "ID",
    "PASSPORT" -> "PASSPORT", "MEDICAL_ID" -> "MEDICAL_ID",
    "UNIFIED_BUSINESS_NO" -> "UNIFIED_BUSINESS_NO",
    "ADDRESS" -> "ADDRESS", "LOCATION" -> "ADDRESS", "LOC" -> "ADDRESS",
    "GPE" -> "ADDRESS", "CITY" -> "ADDRESS", "STATE" -> "ADDRESS",
    "ZIP" -> "ADDRESS", "POSTAL_CODE" -> "ADDRESS",
    "ORG" -> "ORGANIZATION", "ORGANIZATION" -> "ORGANIZATION",
    "COMPANY" -> "ORGANIZATION", "HOSPITAL" -> "ORGANIZATION",
    "DATE" -> "DATE", "DOB" -> "DATE", "DATE_OF_BIRTH" -> "DATE",
    "BIRTHDATE" -> "DATE", "TIME" -> "TIME", "DATETIME" -> "TIME",
    "IP" -> "IP_ADDRESS", "IP_ADDRESS" -> "IP_ADDRESS",
    "URL" -> "URL", "WEBSITE" -> "URL",
    "CREDIT_CARD" -> "CREDIT_CARD", "CREDITCARD" -> "CREDIT_CARD",
    "BANK_ACCOUNT" -> "BANK_ACCOUNT", "ACCOUNT_NUMBER" -> "BANK_ACCOUNT",
    "IBAN" -> "BANK_ACCOUNT",
    "LICENSE_PLATE" -> "LICENSE_PLATE", "PLATE" -> "LICENSE_PLATE",
    "AGE" -> "AGE")

  private val TrailingIndexRe = Pattern.compile("(?:[_-]?\\d+)+$")
  private val NonAlphaRe = Pattern.compile("[^A-Z_]+")
  private val MultiUnderscoreRe = Pattern.compile("_+")

  /** `normalize_raw_entity_type` (`canonical.py:111-119`). */
  def normalizeRawEntityType(raw: String): String = {
    var v = Option(raw).getOrElse("").trim.toUpperCase.replace("-", "_").replace(" ", "_")
    v = TrailingIndexRe.matcher(v).replaceAll("")
    v = NonAlphaRe.matcher(v).replaceAll("")
    v = MultiUnderscoreRe.matcher(v).replaceAll("_")
    v.stripPrefix("_").stripSuffix("_")
  }

  /** `canonicalize_entity_type` (`canonical.py:122-178`) — exact map then
    * the 16 heuristic fallbacks IN ORDER.
    */
  def canonicalizeEntityType(raw: String, unknownLabel: String = "PII"): Option[String] = {
    if (raw == null) return None
    val key = normalizeRawEntityType(raw)
    if (key.isEmpty) return None
    exactTypeMap.get(key).orElse {
      val r =
        if (key.contains("EMAIL") || key.contains("MAIL")) "EMAIL"
        else if (key.contains("PHONE") || key.startsWith("TEL") || key.contains("MOBILE")) "PHONE"
        else if (key.contains("PASSPORT")) "PASSPORT"
        else if (key.contains("MED") && key.contains("ID")) "MEDICAL_ID"
        else if (key.endsWith("_ID") || key.endsWith("ID") || key.contains("SSN")) "ID"
        else if (key.contains("NAME") && !key.contains("USER")) "NAME"
        else if (key.contains("USER") || key.contains("HANDLE")) "USERNAME"
        else if (key.contains("ADDRESS") || key.contains("CITY") || key.contains("STATE")
          || key.contains("ZIP") || key.contains("POSTAL")) "ADDRESS"
        else if (key.contains("ORG") || key.contains("COMPANY") || key.contains("HOSPITAL"))
          "ORGANIZATION"
        else if (key.contains("DATE") || key.contains("BIRTH") || key == "DOB") "DATE"
        else if (key.contains("TIME")) "TIME"
        else if (key.contains("IP")) "IP_ADDRESS"
        else if (key.contains("URL") || key.contains("WEB")) "URL"
        else if (key.contains("CREDIT") || key.contains("CARD")) "CREDIT_CARD"
        else if (key.contains("BANK") || key.contains("ACCOUNT") || key.contains("IBAN"))
          "BANK_ACCOUNT"
        else if (key.contains("PLATE") || key.contains("LICENSE")) "LICENSE_PLATE"
        else if (key.contains("AGE")) "AGE"
        else null
      if (r != null) Some(r)
      else {
        val unknown = normalizeRawEntityType(unknownLabel)
        if (unknown.nonEmpty) Some(unknown) else None
      }
    }
  }
}

/** D10 — PII-markup extraction (`training/pii_markup.py`). */
object PiiMarkup {

  final case class PiiBlock(piiType: String, value: String,
      valueStart: Int, valueEnd: Int, blockStart: Int, blockEnd: Int)

  val XmlRe: Pattern = Pattern.compile(
    "<PII\\s+type=['\"]([A-Za-z0-9_]+)['\"]\\s*>(.*?)</PII>", Pattern.DOTALL)
  val BracketRe: Pattern = Pattern.compile(
    "\\[([A-Za-z0-9_]+)\\](.*?)\\[/\\1\\]", Pattern.DOTALL)

  /** `detect_markup_format` (`pii_markup.py:31-39`). */
  def detectMarkupFormat(text: String): Option[String] = {
    val raw = Option(text).getOrElse("")
    if (XmlRe.matcher(raw).find()) Some("xml")
    else if (BracketRe.matcher(raw).find()) Some("bracket")
    else None
  }

  /** `extract_pii_blocks` (`pii_markup.py:42-65`); spans in code points. */
  def extractPiiBlocks(text: String, fmt: Option[String] = None): List[PiiBlock] = {
    val raw = Option(text).getOrElse("")
    val resolved = fmt.orElse(detectMarkupFormat(raw))
    resolved match {
      case None => Nil
      case Some(f) =>
        val re = if (f == "xml") XmlRe else BracketRe
        val off = new CpOffsets(raw)
        val m = re.matcher(raw)
        val out = List.newBuilder[PiiBlock]
        while (m.find()) {
          out += PiiBlock(
            Option(m.group(1)).getOrElse("").trim,
            Option(m.group(2)).getOrElse(""),
            off.toCp(m.start(2)), off.toCp(m.end(2)),
            off.toCp(m.start(0)), off.toCp(m.end(0)))
        }
        out.result()
    }
  }

  /** R7 — `mask_spans` (`pii_markup.py:68-95`): bounds-checked, sorted
    * (start, end) DESC, spliced right-to-left against the running string.
    */
  def maskSpans(text: String, spans: Seq[(Int, Int)], placeholder: String = ""): String = {
    val raw = Option(text).getOrElse("")
    if (spans.isEmpty) return raw
    val cpLen = raw.codePointCount(0, raw.length)
    val safe = spans.collect {
      case (s, e) if s >= 0 && e > s && e <= cpLen => (s, e)
    }
    if (safe.isEmpty) return raw
    val sorted = safe.sortBy { case (s, e) => (-s, -e) }
    var out = raw
    sorted.foreach { case (s, e) =>
      out = graft.redact.Redactor.splice(out, s, e, placeholder)
    }
    out
  }

  def maskPiiBlocks(text: String, blocks: Seq[PiiBlock], placeholder: String = ""): String =
    maskSpans(text, blocks.map(b => (b.blockStart, b.blockEnd)), placeholder)
}

/** P7/R6 — placeholder parsing & span placeholderization
  * (`training/placeholders.py`).
  */
object Placeholders {

  private val PlaceholderRe: Pattern =
    Pattern.compile("([<\\[{])([A-Za-z_]+?)(?:_?\\d+)?([>\\]}])")

  /** `contains_cjk` (`placeholders.py:13-20`). */
  def containsCjk(text: String): Boolean =
    text != null && text.exists(c => c >= 0x4e00 && c <= 0x9fff)

  /** `canonicalize_placeholder_text` (`placeholders.py:23-31`). */
  def canonicalizePlaceholderText(text: String, unknownLabel: String = "PII"): String = {
    val m = PlaceholderRe.matcher(Option(text).getOrElse(""))
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val mapped = Canonical.canonicalizeEntityType(m.group(2), unknownLabel)
        .getOrElse(unknownLabel)
      m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)}$mapped${m.group(3)}"))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** `replace_spans_with_placeholders` (`placeholders.py:34-70`). Entities
    * as (start, end, rawType); spans in code points.
    */
  def replaceSpansWithPlaceholders(
      text: String,
      entities: Seq[(Int, Int, String)],
      unknownLabel: String = "PII"
  ): String = {
    if (entities.isEmpty) return text
    val cpLen = text.codePointCount(0, text.length)
    val spans = entities.flatMap { case (s, e, typ) =>
      if (s < 0 || e <= s || e > cpLen) None
      else Canonical.canonicalizeEntityType(typ, unknownLabel).map(t => (s, e, t))
    }
    if (spans.isEmpty) return text
    var out = text
    spans.sortBy { case (s, e, _) => (-s, -e) }.foreach { case (s, e, t) =>
      out = graft.redact.Redactor.splice(out, s, e, s"<$t>")
    }
    out
  }
}

/** D11 — masked-pair gold-span recovery (`training/masked_pairs.py`). */
object MaskedPairs {

  final case class TokenSpan(token: String, start: Int, end: Int)
  final case class GoldEntity(typ: String, start: Int, end: Int, text: String)

  private val PlaceholderRegex: Pattern =
    Pattern.compile("[<\\[{]([A-Za-z_]+?)(?:_?\\d+)?[>\\]}]")

  /** `PLACEHOLDER_TYPE_MAP` (`masked_pairs.py:14-36`). */
  val placeholderTypeMap: Map[String, String] = Map(
    "PER" -> "NAME", "PERSON" -> "NAME", "NAME" -> "NAME",
    "EMAIL" -> "EMAIL", "EMAIL_ADDRESS" -> "EMAIL",
    "PHONE" -> "PHONE", "PHONE_NUMBER" -> "PHONE", "MOBILE" -> "PHONE",
    "TEL" -> "PHONE",
    "ADDRESS" -> "ADDRESS", "LOCATION" -> "ADDRESS", "LOC" -> "ADDRESS",
    "GPE" -> "ADDRESS",
    "ORG" -> "ORGANIZATION", "ORGANIZATION" -> "ORGANIZATION",
    "ID" -> "ID", "SSN" -> "ID", "PASSPORT" -> "PASSPORT",
    "MEDICAL_ID" -> "MEDICAL_ID", "UNIFIED_BUSINESS_NO" -> "UNIFIED_BUSINESS_NO")

  /** `tokenize_whitespace` (`masked_pairs.py:45-51`); cp offsets. */
  def tokenizeWhitespace(text: String): IndexedSeq[TokenSpan] = {
    val off = new CpOffsets(text)
    val m = Pattern.compile("\\S+").matcher(text)
    val out = IndexedSeq.newBuilder[TokenSpan]
    while (m.find()) out += TokenSpan(m.group(), off.toCp(m.start), off.toCp(m.end))
    out.result()
  }

  /** `parse_placeholder_type` (`masked_pairs.py:54-63`). */
  def parsePlaceholderType(token: String): Option[String] = {
    val m = PlaceholderRegex.matcher(token)
    if (!m.find()) None
    else {
      val raw = m.group(1).trim.toUpperCase
      if (raw.isEmpty) None else Some(placeholderTypeMap.getOrElse(raw, raw))
    }
  }

  /** `extract_entities_from_masked_pair` (`masked_pairs.py:66-138`):
    * SequenceMatcher(autojunk=False) opcodes over whitespace tokens;
    * `replace` blocks with placeholder tokens → per-token or block-level
    * entities; first-wins dedupe on (start, end, type).
    */
  def extractEntitiesFromMaskedPair(originalText: String, maskedText: String): List[GoldEntity] = {
    val origTokens = tokenizeWhitespace(originalText)
    val maskTokens = tokenizeWhitespace(maskedText)
    val intern = mutable.HashMap.empty[String, Int]
    def ids(ts: IndexedSeq[TokenSpan]): Array[Int] =
      ts.iterator.map(t => intern.getOrElseUpdate(t.token, intern.size)).toArray
    val opcodes = SeqMatcher.opcodes(ids(origTokens), ids(maskTokens), autojunk = false)

    val entities = mutable.ArrayBuffer.empty[GoldEntity]
    opcodes.foreach { case (tag, i1, i2, j1, j2) =>
      if (tag == "replace" && i1 < i2) {
        val placeholderTypes = (j1 until j2).toList
          .flatMap(j => parsePlaceholderType(maskTokens(j).token))
        if (placeholderTypes.nonEmpty) {
          if (i2 - i1 == placeholderTypes.length) {
            placeholderTypes.zipWithIndex.foreach { case (t, o) =>
              val tok = origTokens(i1 + o)
              entities += GoldEntity(t, tok.start, tok.end,
                graft.redact.Redactor.cpSlice(originalText, tok.start, tok.end))
            }
          } else {
            val unique = placeholderTypes.distinct.sorted
            val t = if (unique.length == 1) unique.head else "PII"
            val start = origTokens(i1).start
            val end = origTokens(i2 - 1).end
            entities += GoldEntity(t, start, end,
              graft.redact.Redactor.cpSlice(originalText, start, end))
          }
        }
      }
    }
    // O6 — `_dedupe_entities` (`masked_pairs.py:143-156`): first-wins
    val seen = mutable.HashSet.empty[(Int, Int, String)]
    entities.iterator.filter { e =>
      e.typ.nonEmpty && seen.add((e.start, e.end, e.typ))
    }.toList
  }
}

/** F9/F10 — BIO label list + span-to-token alignment
  * (`training/tokenization.py`).
  */
object Tokenization {

  /** `build_bio_label_list` (`tokenization.py:8-16`). */
  def buildBioLabelList(entityTypes: Iterable[String]): List[String] = {
    val types = entityTypes.filter(t => t != null && t.nonEmpty).toSet.toList.sorted
    "O" :: types.flatMap(t => List(s"B-$t", s"I-$t"))
  }

  /** `align_entities_to_tokens` (`tokenization.py:19-47`): special tokens
    * ((0,0)) → -100; first fully-containing entity wins; B- iff token start
    * == entity start.
    */
  def alignEntitiesToTokens(
      entities: Seq[(Int, Int, String)],
      offsets: Seq[(Int, Int)],
      labelToId: Map[String, Int]
  ): List[Int] =
    offsets.iterator.map { case (ts, te) =>
      if (ts == 0 && te == 0) -100
      else {
        val label = entities.collectFirst {
          case (es, ee, typ) if typ != null && typ.nonEmpty && ts >= es && te <= ee =>
            (if (ts == es) "B-" else "I-") + typ
        }.getOrElse("O")
        labelToId.getOrElse(label, labelToId("O"))
      }
    }.toList
}

/** O2/O4 — dataset mix shuffle and reservoir sample (`training/mix.py`)
  * with bit-exact Python `random` semantics.
  */
object Mix {

  /** `random.Random(seed).shuffle(x)` — Fisher–Yates descending with
    * `_randbelow(i+1)` (CPython random.py `shuffle`). Returns the shuffled
    * order as indices into the input.
    */
  def pythonShuffleIndices(n: Int, seed: Long): IndexedSeq[Int] = {
    val rng = new PyRandom(seed)
    val x = Array.tabulate(n)(identity)
    var i = n - 1
    while (i > 0) {
      val j = rng.randbelow(i + 1)
      val tmp = x(i); x(i) = x(j); x(j) = tmp
      i -= 1
    }
    x.toIndexedSeq
  }

  /** `mix_span_examples` (`mix.py:33-48`): concatenate then shuffle. */
  def mixShuffle[T](sources: Seq[Seq[T]], seed: Long, shuffle: Boolean = true): List[T] = {
    val combined = sources.flatten.toIndexedSeq
    if (!shuffle || combined.isEmpty) combined.toList
    else pythonShuffleIndices(combined.length, seed).map(combined).toList
  }

  /** The streaming reservoir (`mix.py:104-121`): first k kept, then item
    * t (1-based total) replaces slot j = randint(0, t-1) when j < k.
    */
  def reservoirSample[T](items: Iterator[T], k: Int, seed: Long): List[T] = {
    val rng = new PyRandom(seed)
    val buf = mutable.ArrayBuffer.empty[T]
    var total = 0
    items.foreach { it =>
      total += 1
      if (buf.length < k) buf += it
      else {
        val j = rng.randint(0, total - 1)
        if (j < k) buf(j) = it
      }
    }
    buf.toList
  }
}
