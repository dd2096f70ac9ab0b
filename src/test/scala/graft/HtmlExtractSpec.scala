package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.extract.HtmlExtract
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class HtmlExtractSpec extends AnyFunSuite {

  test("getText matches the bs4/html.parser golden event stream") {
    val in = getClass.getResourceAsStream("/golden_html.json")
    require(in != null)
    val root = try new ObjectMapper().readTree(in) finally in.close()
    root.elements().asScala.foreach { c =>
      val html = c.get("html").asText()
      val want = c.get("text").asText()
      val got = HtmlExtract.getText(html)
      assert(got == want, s"html=${html.take(120)}\n got=$got\nwant=$want")
    }
  }

  test("mainContent drops nav/script/style boilerplate, keeps content") {
    val html =
      """<html><head><title>T</title><style>p{color:red}</style></head><body>
        |<nav><a href="/">home</a> <a href="/about">about</a> <a href="/x">x</a></nav>
        |<p>Contact alice@example.com for order details now.</p>
        |<div>Second real paragraph with enough words to keep.</div>
        |<script>var tracking = 1;</script>
        |<footer><a href="/tos">tos</a></footer>
        |</body></html>""".stripMargin
    val got = HtmlExtract.mainContent(html)
    assert(got.contains("alice@example.com"))
    assert(got.contains("Second real paragraph"))
    assert(!got.contains("tracking"))
    assert(!got.contains("color:red"))
    assert(!got.contains("home"))
    assert(!got.contains("tos"))
  }

  test("mainContent keeps CJK content blocks") {
    val html = "<body><nav><a href='/'>首頁</a></nav><p>病歷號 M1234567，電話 0912-345-678。</p></body>"
    val got = HtmlExtract.mainContent(html)
    assert(got.contains("M1234567"))
    assert(!got.contains("首頁"))
  }

  test("looksLikeHtml gates on document-shaped text only") {
    assert(HtmlExtract.looksLikeHtml("<html><body>x</body></html>"))
    assert(HtmlExtract.looksLikeHtml("  <!DOCTYPE html><html></html>"))
    assert(!HtmlExtract.looksLikeHtml("a < b and c > d"))
    assert(!HtmlExtract.looksLikeHtml("<p>fragment</p>"))
    assert(!HtmlExtract.looksLikeHtml(""))
  }
}
