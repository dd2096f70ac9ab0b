package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Streaming HTML text extraction.
  *
  * Two modes:
  *
  *  1. `getText(html)` — parity with the reference's observable HTML
  *     contract: `BeautifulSoup(html, "html.parser").get_text(separator="\n")`
  *     (`/root/reference/src/deid_pipeline/handlers/text.py:17-24`). Tree
  *     shape is irrelevant to `get_text`; only the ordered sequence of text
  *     nodes matters, so this is a single-pass event lexer mirroring
  *     CPython `html.parser` tokenization: char/entity refs decoded and
  *     merged into contiguous data runs (`convert_charrefs=True`),
  *     `<script>/<style>` content emitted raw (CDATA content elements),
  *     comments / declarations / processing instructions dropped, `<` not
  *     followed by `[a-zA-Z!/?]` treated as literal text.
  *
  *  2. `mainContent(html)` — Boilerpipe/trafilatura-style block scoring
  *     (north rule): group text into blocks at block-level element
  *     boundaries, score by word count and link density, keep content-y
  *     blocks. Additive capability, not parity-gated.
  */
object HtmlExtract {

  /** One text node with its enclosing-block and link context. `ignorable`
    * marks script/style/title content — emitted by `getText` (bs4 parity)
    * but never eligible for `mainContent`.
    */
  private final case class Node(
      text: String, blockId: Int, inLink: Boolean, ignorable: Boolean = false)

  private val RawTextTags = Set("script", "style")
  private val BlockTags = Set(
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "td", "th", "tr", "table", "article", "section", "header", "footer",
    "nav", "aside", "blockquote", "pre", "br", "hr", "body", "html",
    "main", "figure", "figcaption", "form", "fieldset", "dd", "dt", "dl"
  )

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "hellip" -> "…",
    "mdash" -> "—", "ndash" -> "–", "lsquo" -> "‘",
    "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "times" -> "×",
    "divide" -> "÷", "deg" -> "°", "middot" -> "·",
    "bull" -> "•", "dagger" -> "†", "sect" -> "§",
    "para" -> "¶", "plusmn" -> "±", "frac12" -> "½",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "szlig" -> "ß", "agrave" -> "à",
    "aacute" -> "á", "eacute" -> "é", "egrave" -> "è",
    "iacute" -> "í", "oacute" -> "ó", "uacute" -> "ú",
    "ntilde" -> "ñ", "uuml" -> "ü", "ouml" -> "ö",
    "auml" -> "ä", "shy" -> "\u00ad"
  )

  /** bs4 `soup.get_text(separator="\n")` parity. */
  def getText(html: String): String = {
    val nodes = lex(html)
    nodes.iterator.map(_.text).mkString("\n")
  }

  /** Density-scored main content: kept blocks joined by "\n".
    *
    * `maxLinkDensity` default 1/3 = Boilerpipe's NumWordsRules boundary
    * (Kohlschütter et al., WSDM 2010): real nav rows ("Next: <a>…</a>,
    * Previous: <a>…</a>") carry enough comma/label filler to sit in the
    * 0.35–0.5 band, so a 0.5 cutoff keeps them.
    */
  def mainContent(html: String, minWords: Int = 2, maxLinkDensity: Double = 1.0 / 3): String = {
    val nodes = lex(html)
    if (nodes.isEmpty) return ""
    // group nodes into blocks
    val blocks = ArrayBuffer.empty[(ArrayBuffer[Node], Int)] // nodes, blockId
    nodes.foreach { n =>
      if (blocks.nonEmpty && blocks.last._2 == n.blockId) blocks.last._1 += n
      else blocks += ((ArrayBuffer(n), n.blockId))
    }
    val kept = blocks.iterator.flatMap { case (allNs, _) =>
      val ns = allNs.filterNot(_.ignorable)
      val text = ns.iterator.map(_.text).mkString(" ").trim
      if (text.isEmpty) None
      else {
        val words = wordCount(text)
        val linkChars = ns.iterator.filter(_.inLink).map(_.text.length).sum
        val totalChars = math.max(1, ns.iterator.map(_.text.length).sum)
        val linkDensity = linkChars.toDouble / totalChars
        val cjk = text.exists(c => c >= '一' && c <= '鿿')
        val enough = if (cjk) text.length >= minWords else words >= minWords
        if (enough && linkDensity <= maxLinkDensity) Some(collapseWs(text))
        else None
      }
    }.toSeq
    kept.mkString("\n")
  }

  /** Heuristic: does this text look like an HTML document? Used to select
    * the extraction path per row (the reference dispatches on file
    * extension; a turn table has no extension).
    */
  def looksLikeHtml(text: String): Boolean = {
    val t = text
    var i = 0
    while (i < t.length && Character.isWhitespace(t.charAt(i))) i += 1
    if (i >= t.length || t.charAt(i) != '<') return false
    val rest = t.substring(i, math.min(t.length, i + 15)).toLowerCase
    rest.startsWith("<!doctype") || rest.startsWith("<html")
  }

  private def wordCount(s: String): Int = {
    var n = 0; var in = false; var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !in) { n += 1; in = true } else if (ws) in = false
      i += 1
    }
    n
  }

  private def collapseWs(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** Event lexer: ordered text nodes with block/link context. */
  private def lex(html: String): IndexedSeq[Node] = {
    val out = ArrayBuffer.empty[Node]
    val n = html.length
    var i = 0
    var blockId = 0
    var linkDepth = 0
    val data = new java.lang.StringBuilder

    def flush(): Unit = {
      if (data.length > 0) {
        out += Node(data.toString, blockId, linkDepth > 0)
        data.setLength(0)
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c2 = html.charAt(i + 1)
        if (c2 == '!') {
          flush()
          if (html.startsWith("<!--", i)) {
            val end = html.indexOf("-->", i + 4)
            i = if (end < 0) n else end + 3
          } else {
            val end = html.indexOf('>', i + 2)
            i = if (end < 0) n else end + 1
          }
        } else if (c2 == '?') {
          flush()
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (c2 == '/' || Character.isLetter(c2)) {
          flush()
          val isEnd = c2 == '/'
          val nameStart = if (isEnd) i + 2 else i + 1
          var j = nameStart
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)) ||
            html.charAt(j) == '-' || html.charAt(j) == ':')) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // skip to end of tag, honoring quoted attribute values
          var k = j
          var quote: Char = 0
          var selfClose = false
          while (k < n && (quote != 0 || html.charAt(k) != '>')) {
            val ch = html.charAt(k)
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (ch == '"' || ch == '\'') quote = ch
            k += 1
          }
          if (k > j && html.charAt(k - 1) == '/') selfClose = true
          i = if (k < n) k + 1 else n

          if (!isEnd && !selfClose && RawTextTags.contains(name)) {
            // CDATA content element: raw data until matching close tag
            blockId += 1
            val close = s"</$name"
            var e = indexOfIgnoreCase(html, close, i)
            if (e < 0) e = n
            if (e > i)
              out += Node(html.substring(i, e), blockId, linkDepth > 0, ignorable = true)
            // skip past the close tag's '>'
            var g = e + close.length
            while (g < n && html.charAt(g) != '>') g += 1
            i = if (g < n) g + 1 else n
            blockId += 1
          } else {
            if (BlockTags.contains(name) || name == "title") blockId += 1
            if (name == "a") {
              if (isEnd) linkDepth = math.max(0, linkDepth - 1)
              else if (!selfClose) linkDepth += 1
            }
          }
        } else {
          // html.parser emits a lone '<' as its own data event
          flush()
          out += Node("<", blockId, linkDepth > 0)
          i += 1
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(html, i)
        data.append(decoded); i = next
      } else {
        data.append(c); i += 1
      }
    }
    flush()
    out.toIndexedSeq
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    var i = from
    val max = hay.length - needle.length
    while (i <= max) {
      if (hay.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Decode one char/entity ref at `i` (html.parser convert_charrefs). */
  private def decodeEntity(html: String, i: Int): (String, Int) = {
    val n = html.length
    if (i + 1 >= n) return ("&", i + 1)
    if (html.charAt(i + 1) == '#') {
      var j = i + 2
      var hex = false
      if (j < n && (html.charAt(j) == 'x' || html.charAt(j) == 'X')) { hex = true; j += 1 }
      val digStart = j
      while (j < n && (if (hex) isHexDigit(html.charAt(j)) else Character.isDigit(html.charAt(j)))) j += 1
      if (j == digStart) return ("&", i + 1)
      val cp =
        try Integer.parseInt(html.substring(digStart, j), if (hex) 16 else 10)
        catch { case _: NumberFormatException => -1 }
      val end = if (j < n && html.charAt(j) == ';') j + 1 else j
      if (cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff))
        (new String(Character.toChars(if (cp == 0) 0xfffd else cp)), end)
      else ("�", end)
    } else {
      var j = i + 1
      while (j < n && j - i <= 32 && Character.isLetterOrDigit(html.charAt(j))) j += 1
      val name = html.substring(i + 1, j)
      val hasSemi = j < n && html.charAt(j) == ';'
      if (hasSemi) {
        NamedEntities.get(name) match {
          case Some(v) => (v, j + 1)
          case None => ("&", i + 1)
        }
      } else {
        // HTML5 allows a set of legacy entities without the trailing
        // semicolon, resolved by LONGEST-PREFIX match (html.unescape
        // semantics): "&ampb" -> "&b", "&ltx" -> "<x".
        var len = math.min(name.length, NoSemiMaxLen)
        var hit: Option[(String, Int)] = None
        while (hit.isEmpty && len >= NoSemiMinLen) {
          val prefix = name.substring(0, len)
          NoSemiEntities.get(prefix) match {
            case Some(v) => hit = Some((v, i + 1 + len))
            case None => len -= 1
          }
        }
        hit.getOrElse(("&", i + 1))
      }
    }
  }

  // Legacy no-semicolon entities (subset of the HTML5 list).
  private val NoSemiEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®"
  )
  private val NoSemiMinLen = NoSemiEntities.keys.map(_.length).min
  private val NoSemiMaxLen = NoSemiEntities.keys.map(_.length).max

  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
}
