package graft.extract

import java.nio.charset.StandardCharsets

/** Font machinery for real-world PDF text extraction (S4 generalization):
  * code→unicode decoding and glyph advances for the font classes that
  * machine-generated PDFs actually use (PyMuPDF's `page.get_text` handles
  * these through MuPDF; this is the from-scratch equivalent for the
  * extraction subset — `/root/reference/src/deid_pipeline/handlers/pdf.py:13-42`
  * defines only the downstream contract, the font handling itself is from
  * the public PDF 1.7 spec, ISO 32000-1 §9).
  *
  * Decode priority per the spec's text-extraction guidance (§9.10.2):
  *   1. /ToUnicode CMap (bfchar/bfrange),
  *   2. /Encoding dict: /BaseEncoding + /Differences glyph names (AGL),
  *   3. named encoding (/WinAnsiEncoding ≈ cp1252, /MacRomanEncoding subset),
  *   4. identity Latin-1 (covers StandardEncoding's ASCII range — where the
  *      synthetic builder and most generators put their text).
  *
  * Type0/Identity-H fonts decode 2-byte codes through ToUnicode (or identity
  * when absent). Widths come from /Widths+/FirstChar or the standard-14
  * tables (public Adobe AFM metrics) for unembedded base fonts.
  */
object PdfFonts {

  /** One font's decode + metrics view. `twoByte` = CID codes (Type0). */
  final case class Font(
      name: String,
      twoByte: Boolean,
      toUnicode: Map[Int, String],
      diffMap: Map[Int, String],
      baseEncoding: String, // "WinAnsi" | "MacRoman" | "Standard" | ""
      widths: Map[Int, Int], // code → 1/1000 em
      defaultWidth: Int,
      spaceWidth: Int // width of the space glyph (kerning-gap heuristic)
  ) {

    /** Decode a raw string-token (bytes preserved as ISO-8859-1 chars). */
    def decode(raw: String): String = {
      val sb = new java.lang.StringBuilder(raw.length)
      if (twoByte) {
        var i = 0
        while (i + 1 < raw.length) {
          val code = ((raw.charAt(i) & 0xff) << 8) | (raw.charAt(i + 1) & 0xff)
          sb.append(decodeCode(code))
          i += 2
        }
      } else {
        var i = 0
        while (i < raw.length) {
          sb.append(decodeCode(raw.charAt(i) & 0xff))
          i += 1
        }
      }
      sb.toString
    }

    def decodeCode(code: Int): String =
      toUnicode.get(code)
        .orElse(diffMap.get(code).flatMap(Agl.toUnicode))
        .getOrElse(baseDecode(code))

    private def baseDecode(code: Int): String = baseEncoding match {
      case "WinAnsi" => Encodings.winAnsi(code)
      case "MacRoman" => Encodings.macRoman(code)
      case "OT1" => Encodings.ot1(code)
      case _ => if (code == 0) "" else String.valueOf(code.toChar)
    }

    /** Advance of one code, 1/1000 em. */
    def width(code: Int): Int = widths.getOrElse(code, defaultWidth)
  }

  /** Fallback font: identity decode, Helvetica-ish metrics. */
  val default: Font =
    Font("", twoByte = false, Map.empty, Map.empty, "", Map.empty, 500, 278)

  // ---- Adobe Glyph List (subset) -------------------------------------------

  /** AGL subset: the names that appear in /Differences arrays of fonts from
    * TeX / office / browser producers. Full AGL is ~4,300 entries; this
    * covers ASCII + the common typographic and Latin-1 extras, plus the
    * `uniXXXX` convention.
    */
  object Agl {
    private val named: Map[String, String] = {
      val ascii = Map(
        "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
        "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
        "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
        "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
        "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
        "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
        "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
        "greater" -> ">", "question" -> "?", "at" -> "@",
        "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
        "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
        "braceleft" -> "{", "bar" -> "|", "braceright" -> "}", "asciitilde" -> "~")
      val letters =
        (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c.toString).toMap
      val typographic = Map(
        "quoteright" -> "’", "quoteleft" -> "‘",
        "quotedblleft" -> "“", "quotedblright" -> "”",
        "quotedblbase" -> "„", "quotesinglbase" -> "‚",
        "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
        "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
        "guillemotleft" -> "«", "guillemotright" -> "»",
        "guilsinglleft" -> "‹", "guilsinglright" -> "›",
        "fi" -> "ﬁ", "fl" -> "ﬂ", "ff" -> "ﬀ",
        "ffi" -> "ﬃ", "ffl" -> "ﬄ",
        "degree" -> "°", "copyright" -> "©", "registered" -> "®",
        "trademark" -> "™", "section" -> "§", "paragraph" -> "¶",
        "cent" -> "¢", "sterling" -> "£", "yen" -> "¥",
        "Euro" -> "€", "currency" -> "¤", "florin" -> "ƒ",
        "exclamdown" -> "¡", "questiondown" -> "¿",
        "periodcentered" -> "·", "multiply" -> "×", "divide" -> "÷",
        "plusminus" -> "±", "logicalnot" -> "¬", "mu" -> "µ",
        "minus" -> "−", "fraction" -> "⁄", "percent" -> "%",
        "circumflex" -> "ˆ", "tilde" -> "˜", "macron" -> "¯",
        "breve" -> "˘", "dotaccent" -> "˙", "ring" -> "˚",
        "cedilla" -> "¸", "hungarumlaut" -> "˝", "ogonek" -> "˛",
        "caron" -> "ˇ", "dotlessi" -> "ı",
        "brokenbar" -> "¦", "onesuperior" -> "¹",
        "twosuperior" -> "²", "threesuperior" -> "³",
        "onequarter" -> "¼", "onehalf" -> "½", "threequarters" -> "¾",
        "nbspace" -> " ", "sfthyphen" -> "­")
      val latin = Map(
        "Agrave" -> "À", "Aacute" -> "Á", "Acircumflex" -> "Â",
        "Atilde" -> "Ã", "Adieresis" -> "Ä", "Aring" -> "Å",
        "AE" -> "Æ", "Ccedilla" -> "Ç", "Egrave" -> "È",
        "Eacute" -> "É", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë",
        "Igrave" -> "Ì", "Iacute" -> "Í", "Icircumflex" -> "Î",
        "Idieresis" -> "Ï", "Eth" -> "Ð", "Ntilde" -> "Ñ",
        "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocircumflex" -> "Ô",
        "Otilde" -> "Õ", "Odieresis" -> "Ö", "Oslash" -> "Ø",
        "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucircumflex" -> "Û",
        "Udieresis" -> "Ü", "Yacute" -> "Ý", "Thorn" -> "Þ",
        "germandbls" -> "ß", "agrave" -> "à", "aacute" -> "á",
        "acircumflex" -> "â", "atilde" -> "ã", "adieresis" -> "ä",
        "aring" -> "å", "ae" -> "æ", "ccedilla" -> "ç",
        "egrave" -> "è", "eacute" -> "é", "ecircumflex" -> "ê",
        "edieresis" -> "ë", "igrave" -> "ì", "iacute" -> "í",
        "icircumflex" -> "î", "idieresis" -> "ï", "eth" -> "ð",
        "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
        "ocircumflex" -> "ô", "otilde" -> "õ", "odieresis" -> "ö",
        "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú",
        "ucircumflex" -> "û", "udieresis" -> "ü", "yacute" -> "ý",
        "thorn" -> "þ", "ydieresis" -> "ÿ",
        "OE" -> "Œ", "oe" -> "œ", "Scaron" -> "Š",
        "scaron" -> "š", "Ydieresis" -> "Ÿ", "Zcaron" -> "Ž",
        "zcaron" -> "ž", "Lslash" -> "Ł", "lslash" -> "ł")
      ascii ++ letters ++ typographic ++ latin
    }

    def toUnicode(glyph: String): Option[String] =
      named.get(glyph).orElse {
        // uniXXXX / uXXXX[XX] convention (AGL algorithmic names)
        if (glyph.startsWith("uni") && glyph.length >= 7)
          try Some(new String(Character.toChars(Integer.parseInt(glyph.substring(3, 7), 16))))
          catch { case _: NumberFormatException => None }
        else if (glyph.startsWith("u") && glyph.length >= 5 && glyph.length <= 7)
          try Some(new String(Character.toChars(Integer.parseInt(glyph.substring(1), 16))))
          catch { case _: NumberFormatException => None }
        else None
      }
  }

  // ---- simple-font named encodings ----------------------------------------

  object Encodings {

    /** WinAnsiEncoding = cp1252: Latin-1 plus the 0x80–0x9F typographic
      * block (PDF spec Appendix D.2).
      */
    private val win8x: Map[Int, String] = Map(
      0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„",
      0x85 -> "…", 0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ",
      0x89 -> "‰", 0x8a -> "Š", 0x8b -> "‹", 0x8c -> "Œ",
      0x8e -> "Ž", 0x91 -> "‘", 0x92 -> "’", 0x93 -> "“",
      0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
      0x98 -> "˜", 0x99 -> "™", 0x9a -> "š", 0x9b -> "›",
      0x9c -> "œ", 0x9e -> "ž", 0x9f -> "Ÿ")

    def winAnsi(code: Int): String =
      win8x.getOrElse(code,
        if (code == 0) "" else String.valueOf(code.toChar))

    /** MacRomanEncoding high half (the entries that matter for text). */
    private val mac8x: Map[Int, String] = Map(
      0x80 -> "Ä", 0x81 -> "Å", 0x82 -> "Ç", 0x83 -> "É",
      0x84 -> "Ñ", 0x85 -> "Ö", 0x86 -> "Ü", 0x87 -> "á",
      0x88 -> "à", 0x89 -> "â", 0x8a -> "ä", 0x8b -> "ã",
      0x8c -> "å", 0x8d -> "ç", 0x8e -> "é", 0x8f -> "è",
      0x90 -> "ê", 0x91 -> "ë", 0x92 -> "í", 0x93 -> "ì",
      0x94 -> "î", 0x95 -> "ï", 0x96 -> "ñ", 0x97 -> "ó",
      0x98 -> "ò", 0x99 -> "ô", 0x9a -> "ö", 0x9b -> "õ",
      0x9c -> "ú", 0x9d -> "ù", 0x9e -> "û", 0x9f -> "ü",
      0xa5 -> "•", 0xd0 -> "–", 0xd1 -> "—", 0xd2 -> "“",
      0xd3 -> "”", 0xd4 -> "‘", 0xd5 -> "’", 0xca -> " ")

    def macRoman(code: Int): String =
      mac8x.getOrElse(code,
        if (code == 0) "" else if (code < 0x80) String.valueOf(code.toChar) else "")

    /** TeX OT1 text layout (Computer Modern roman-family builtin encoding —
      * Knuth's cmr layout, public): the slots that differ from ASCII. Used
      * for unembedded-metadata CM* fonts with neither /ToUnicode nor
      * /Differences (pdftex leaves these on the builtin encoding).
      */
    private val ot1Diff: Map[Int, String] = Map(
      0x0b -> "ﬀ", 0x0c -> "ﬁ", 0x0d -> "ﬂ", 0x0e -> "ﬃ", 0x0f -> "ﬄ",
      0x10 -> "ı", 0x11 -> "ȷ", 0x12 -> "`", 0x13 -> "´", 0x14 -> "ˇ",
      0x15 -> "˘", 0x16 -> "¯", 0x17 -> "˚", 0x18 -> "¸", 0x19 -> "ß",
      0x1a -> "æ", 0x1b -> "œ", 0x1c -> "ø", 0x1d -> "Æ", 0x1e -> "Œ",
      0x1f -> "Ø", 0x22 -> "”", 0x27 -> "’", 0x3c -> "¡", 0x3e -> "¿",
      0x5c -> "“", 0x5e -> "ˆ", 0x5f -> "˙", 0x60 -> "‘", 0x7b -> "–",
      0x7c -> "—", 0x7d -> "˝", 0x7e -> "˜")

    def ot1(code: Int): String =
      ot1Diff.getOrElse(code,
        if (code == 0) "" else if (code < 0x80) String.valueOf(code.toChar) else "")
  }

  // ---- standard-14 metrics -------------------------------------------------

  /** Standard-14 advance widths, chars 32..126, 1/1000 em (public Adobe Core
    * AFM data). Bold/oblique variants approximate with the family base —
    * extraction uses widths only for block bboxes and the kerning-gap space
    * heuristic, where family-level accuracy suffices.
    */
  object Std14 {
    val helvetica: Array[Int] = Array(
      278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
      278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
      584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
      500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
      667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
      278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
      278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584)

    val timesRoman: Array[Int] = Array(
      250, 333, 408, 500, 500, 833, 778, 180, 333, 333, 500, 564, 250, 333,
      250, 278, 500, 500, 500, 500, 500, 500, 500, 500, 500, 500, 278, 278,
      564, 564, 564, 444, 921, 722, 667, 667, 722, 611, 556, 722, 722, 333,
      389, 722, 611, 889, 722, 722, 556, 722, 667, 556, 611, 722, 722, 944,
      722, 722, 611, 333, 278, 333, 469, 500, 333, 444, 500, 444, 500, 444,
      333, 500, 500, 278, 278, 500, 278, 778, 500, 500, 500, 500, 333, 389,
      278, 500, 500, 722, 500, 500, 444, 480, 200, 480, 541)

    /** BaseFont (subset prefix stripped) → (code → width). Courier fixed 600. */
    def widths(baseFont: String): (Map[Int, Int], Int, Int) = {
      val fam = baseFont.replaceFirst("^[A-Z]{6}\\+", "")
      def table(a: Array[Int]) =
        (32 to 126).map(c => c -> a(c - 32)).toMap
      if (fam.startsWith("Courier") || fam.contains("Mono") || fam.startsWith("CMTT"))
        (Map.empty, 600, 600)
      else if (fam.startsWith("Times") || fam.startsWith("CMR") ||
        fam.contains("Serif"))
        (table(timesRoman), 500, 250)
      else // Helvetica/Arial + unknown default
        (table(helvetica), 500, 278)
    }
  }

  // ---- ToUnicode CMap parser ----------------------------------------------

  /** Parse bfchar/bfrange sections of a /ToUnicode CMap stream. Destination
    * hex strings are UTF-16BE.
    */
  def parseToUnicode(cmap: String): Map[Int, String] = {
    val out = Map.newBuilder[Int, String]
    def utf16(hex: String): String = {
      val clean = hex.replaceAll("\\s", "")
      val bytes = new Array[Byte](clean.length / 2)
      var i = 0
      while (i < bytes.length) {
        bytes(i) = Integer.parseInt(clean.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      new String(bytes, StandardCharsets.UTF_16BE)
    }
    def hexInt(hex: String): Int = Integer.parseInt(hex.replaceAll("\\s", ""), 16)

    val bfchar = java.util.regex.Pattern.compile(
      "beginbfchar(.*?)endbfchar", java.util.regex.Pattern.DOTALL)
    val pair = java.util.regex.Pattern.compile("<([0-9a-fA-F\\s]+)>\\s*<([0-9a-fA-F\\s]*)>")
    val mc = bfchar.matcher(cmap)
    while (mc.find()) {
      val mp = pair.matcher(mc.group(1))
      while (mp.find())
        if (mp.group(2).nonEmpty) out += hexInt(mp.group(1)) -> utf16(mp.group(2))
    }

    val bfrange = java.util.regex.Pattern.compile(
      "beginbfrange(.*?)endbfrange", java.util.regex.Pattern.DOTALL)
    // <lo> <hi> <dstStart>   |   <lo> <hi> [<d0> <d1> ...]
    val triple = java.util.regex.Pattern.compile(
      "<([0-9a-fA-F\\s]+)>\\s*<([0-9a-fA-F\\s]+)>\\s*(<[0-9a-fA-F\\s]*>|\\[[^\\]]*\\])")
    val mr = bfrange.matcher(cmap)
    while (mr.find()) {
      val mt = triple.matcher(mr.group(1))
      while (mt.find()) {
        val lo = hexInt(mt.group(1)); val hi = hexInt(mt.group(2))
        val dst = mt.group(3)
        if (dst.startsWith("[")) {
          val items = pairItems(dst)
          var c = lo; var k = 0
          while (c <= hi && k < items.length) {
            out += c -> utf16(items(k)); c += 1; k += 1
          }
        } else {
          val start = dst.substring(1, dst.length - 1).replaceAll("\\s", "")
          if (start.nonEmpty) {
            // increment the LAST UTF-16 code unit (spec: last byte pair)
            val base = utf16(start)
            var c = lo
            while (c <= hi) {
              val delta = c - lo
              val s =
                if (base.isEmpty) ""
                else base.substring(0, base.length - 1) +
                  (base.charAt(base.length - 1) + delta).toChar
              out += c -> s
              c += 1
            }
          }
        }
      }
    }
    out.result()
  }

  private def pairItems(bracketed: String): Array[String] = {
    val m = java.util.regex.Pattern.compile("<([0-9a-fA-F\\s]*)>").matcher(bracketed)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group(1)
    out.toArray
  }
}
