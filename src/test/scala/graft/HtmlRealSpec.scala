package graft

import graft.extract.HtmlExtract
import org.scalatest.funsuite.AnyFunSuite

/** S3 on genuine third-party HTML from the host (texinfo- and
  * DocBook-generated pages with real nav boilerplate) — the strip and
  * density-scored main-content paths must produce readable body text and
  * the main-content path must drop the link-dense navigation block.
  */
class HtmlRealSpec extends AnyFunSuite {

  private def hostHtml(path: String): Option[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isReadable(p))
      Some(new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8))
    else None
  }

  test("texinfo page: body prose extracted; nav link row scored out") {
    hostHtml("/usr/share/doc/libffi8/html/Introduction.html") match {
      case None => cancel("host HTML not present")
      case Some(html) =>
        assert(HtmlExtract.looksLikeHtml(html))
        val full = HtmlExtract.getText(html)
        // strip keeps everything textual (bs4 get_text contract)
        assert(full.contains("libffi"))
        val main = HtmlExtract.mainContent(html)
        assert(main.nonEmpty)
        // body prose survives density scoring
        assert(main.toLowerCase.contains("foreign function interface"), main.take(400))
        // the texinfo header nav ("Next: ..., Previous: ..., Up: ...") is a
        // link-dense block — dropped by the link-density rule
        assert(!main.contains("Previous:") || !main.contains("Up:"),
          s"nav survived:\n${main.take(400)}")
    }
  }

  test("DocBook page extracts substantial readable main content") {
    hostHtml("/usr/share/doc/base-passwd/users-and-groups.html") match {
      case None => cancel("host HTML not present")
      case Some(html) =>
        val main = HtmlExtract.mainContent(html)
        assert(main.length > 500, s"main too short: ${main.length}")
        assert(main.contains("root"), main.take(300))
        // main content is a subset of the full strip
        val full = HtmlExtract.getText(html)
        assert(full.length >= main.length)
    }
  }
}
