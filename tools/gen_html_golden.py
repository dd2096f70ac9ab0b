#!/usr/bin/env python3
"""Golden fixtures for HTML text extraction.

The reference's HTML contract is BeautifulSoup(html, "html.parser")
.get_text(separator="\n") (`handlers/text.py:17-24`). bs4's html.parser
builder creates one NavigableString per handle_data event (convert_charrefs
=True) and get_text joins non-comment strings with the separator — so the
stdlib html.parser event stream IS the golden sequence (bs4 itself is not
installed in the reference env; its HTML path would raise ImportError there,
making this documented-contract parity, not run-parity).
"""
import json
from html.parser import HTMLParser


class TextCollector(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.strings = []

    def handle_data(self, data):
        if data:
            self.strings.append(data)


CASES = [
    "<html><body><p>Contact alice@example.com now.</p></body></html>",
    "<html><head><title>T</title><style>p{color:red}</style></head><body>"
    "<nav><a href=\"/\">home</a> <a href=\"/x\">about</a></nav>"
    "<p>Contact alice@example.com for order details now.</p>"
    "<script>var x=1;</script></body></html>",
    "<p>a</p>\n<p>b</p>",
    "<div>outer <span>inner</span> tail</div>",
    "plain text, no tags",
    "<p>x &amp; y &lt;z&gt; &quot;q&quot; &#65;&#x42;</p>",
    "<!-- comment --><p>kept</p><!-- another -->",
    "<!DOCTYPE html><html><body>doc</body></html>",
    "<script>if (a < b && c > d) { alert('&amp;'); }</script>",
    "<style>a > b { content: \"&gt;\" }</style><p>after</p>",
    "<p>broken < tag</p>",
    "<a href='x.html'>link</a> then <b>bold</b>",
    "<ul><li>one</li><li>two</li></ul>",
    "<td>A123456789</td><td>0912-345-678</td>",
    "<p>中文內容 台北市信義路1號</p><p>第二段</p>",
    "<br/><hr/><img src='x.png'/>solo",
    "<P>UPPER</P><DIV>CASE</DIV>",
    "<p attr=\"a>b\">quoted gt in attr</p>",
    "nested <p>one <b>two</b> three</p> end",
    "&copy; 2024 &nbsp;spaced&hellip;",
    "<textarea><p>not parsed?</p></textarea>",
    "a&ampb &ltx&gt y",  # entities without semicolons
    "<p>emoji &#x1F600; here</p>",
    "",
    "   \n  ",
    "<p></p><p> </p>",
    "<svg><text>svg text</text></svg>",
    "<math><mi>x</mi></math>",
    "<script src='x.js'></script><p>after empty script</p>",
]

out = []
for html in CASES:
    c = TextCollector()
    c.feed(html)
    c.close()
    out.append({"html": html, "strings": c.strings, "text": "\n".join(c.strings)})

with open("/root/repo/src/test/resources/golden_html.json", "w") as f:
    json.dump(out, f, ensure_ascii=False, indent=1)
print("cases:", len(out))
