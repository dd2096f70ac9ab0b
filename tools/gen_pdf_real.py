#!/usr/bin/env python3
"""Generate real-world-style PDF fixtures for PdfRealSpec.

Each fixture exercises a construct that actual producers (TeX, browsers,
office exporters, report generators) emit and that the synthetic
PdfBuilder subset never used:

  classic.pdf  - classic xref + trailer, /Contents ARRAY of two streams,
                 WinAnsiEncoding high-byte text, TD/T* line movement
  objstm.pdf   - PDF 1.5 shape: page + font dicts inside a /ObjStm
                 (Flate), Flate'd content, page tree with NESTED /Kids
                 whose order differs from file order
  filters.pdf  - /ASCIIHexDecode content and an [/ASCII85Decode
                 /FlateDecode] filter chain
  type0.pdf    - Type0 (2-byte) font with a /ToUnicode CMap using both
                 bfchar and bfrange (incl. an array destination), hex
                 string show ops
  diffs.pdf    - simple font with /Encoding dict: /BaseEncoding
                 /WinAnsiEncoding + /Differences glyph names, octal
                 escapes in the literal string
  kern.pdf     - TeX-style TJ arrays: inter-word spaces encoded ONLY as
                 negative kern adjustments; /Widths array present

expected.json maps fixture name -> expected extractText() output
(by construction of the content streams).

Only the Python stdlib is used (zlib); output goes to
src/test/resources/pdf_real/.
"""
import json
import os
import zlib

OUT = os.path.join(os.path.dirname(__file__), "..", "src/test/resources/pdf_real")
os.makedirs(OUT, exist_ok=True)

expected = {}


def build_classic():
    # objects: 1 catalog, 2 pages-root, 3 page, 4+5 content halves, 6 font
    c1 = b"BT /F1 12 Tf 72 700 Td (Call 0912-345-678 now) Tj ET"
    # TD sets leading; T* advances; 0x92 is cp1252 right single quote
    c2 = b"BT /F1 12 Tf 72 660 TD (It\x92s the second stream) Tj T* (third line) Tj ET"
    font = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents [4 0 R 5 0 R] /Resources << /Font << /F1 6 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c1), c1),
        5: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c2), c2),
        6: font,
    }
    write_classic_pdf("classic.pdf", objs)
    expected["classic.pdf"] = (
        "Call 0912-345-678 now\nIt’s the second stream\nthird line")


def build_objstm():
    # pages 3 (text "page ONE...") and 4 ("page TWO...") live inside an
    # ObjStm together with the font and the pages tree; Kids nesting:
    # root(2) -> [7 (inner Pages) , 4], inner 7 -> [3]  => order: 3, 4
    content1 = b"BT /F1 12 Tf 72 700 Td (page ONE id A123456789) Tj ET"
    content2 = b"BT /F1 12 Tf 72 700 Td (page TWO mail a@b.com) Tj ET"
    z1 = zlib.compress(content1)
    z2 = zlib.compress(content2)
    inner = {
        2: b"<< /Type /Pages /Kids [7 0 R 4 0 R] /Count 2 >>",
        7: b"<< /Type /Pages /Parent 2 0 R /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 7 0 R /Contents 10 0 R "
            b"/Resources << /Font << /F1 6 0 R >> >> >>"),
        4: (b"<< /Type /Page /Parent 2 0 R /Contents 11 0 R "
            b"/Resources << /Font << /F1 6 0 R >> >> >>"),
        6: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    # ObjStm payload: header of "num offset" pairs, then bodies at /First
    nums = sorted(inner)  # 2 3 4 6 7
    bodies = b""
    header = b""
    for n in nums:
        header += b"%d %d " % (n, len(bodies))
        bodies += inner[n] + b"\n"
    payload = header + bodies
    first = len(header)
    zpay = zlib.compress(payload)

    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        5: (b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
            b"\nstream\n%s\nendstream" % (len(nums), first, len(zpay), zpay)),
        10: (b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
             % (len(z1), z1)),
        11: (b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
             % (len(z2), z2)),
    }
    write_classic_pdf("objstm.pdf", objs)
    expected["objstm.pdf"] = "page ONE id A123456789\npage TWO mail a@b.com"


def a85(data: bytes) -> bytes:
    import struct
    out = b""
    for i in range(0, len(data), 4):
        chunk = data[i:i + 4]
        pad = 4 - len(chunk)
        v = int.from_bytes(chunk + b"\0" * pad, "big")
        if v == 0 and pad == 0:
            out += b"z"
            continue
        enc = b""
        for _ in range(5):
            enc = bytes([v % 85 + 33]) + enc
            v //= 85
        out += enc[: 5 - pad]
    return out + b"~>"


def build_filters():
    c1 = b"BT /F1 12 Tf 72 700 Td (hex encoded line) Tj ET"
    c2 = b"BT /F1 12 Tf 72 650 Td (a85 flate line) Tj ET"
    hex1 = c1.hex().encode() + b">"
    chain2 = a85(zlib.compress(c2))
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] "
            b"/Resources << /Font << /F1 6 0 R >> >> >>"),
        4: (b"<< /Length %d /Filter /ASCIIHexDecode >>\nstream\n%s\nendstream"
            % (len(hex1), hex1)),
        # chain applies left to right: ASCII85 first, then Flate
        5: (b"<< /Length %d /Filter [/ASCII85Decode /FlateDecode] >>"
            b"\nstream\n%s\nendstream" % (len(chain2), chain2)),
        6: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    write_classic_pdf("filters.pdf", objs)
    expected["filters.pdf"] = "hex encoded line\na85 flate line"


def build_type0():
    # 2-byte codes: 0x0001.. map via bfchar/bfrange
    # text: "Hi 中文 ok" -> codes: H=0001 i=0002 sp=0003 中=0010 文=0011
    #       sp=0003 o=0020 k=0021  (bfrange maps 0020..0021 -> "o","k" array)
    cmap = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
3 beginbfchar
<0001> <0048>
<0002> <0069>
<0003> <0020>
endbfchar
2 beginbfrange
<0010> <0011> <4E2D>
<0020> <0021> [<006F> <006B>]
endbfrange
endcmap
end
end"""
    # NOTE: bfrange <0010><0011> start 4E2D gives 中(4E2D), 4E2E -- but we
    # want 文 (6587); use two bfchar entries instead for exactness
    cmap = cmap.replace(b"2 beginbfrange\n<0010> <0011> <4E2D>",
                        b"1 beginbfrange")
    cmap = cmap.replace(b"3 beginbfchar", b"5 beginbfchar")
    cmap = cmap.replace(b"endbfchar",
                        b"<0010> <4E2D>\n<0011> <6587>\nendbfchar")
    content = b"BT /F1 12 Tf 72 700 Td <00010002> Tj <0003> Tj <00100011> Tj <000300200021> Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 6 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        6: (b"<< /Type /Font /Subtype /Type0 /BaseFont /NOTO+Fake "
            b"/Encoding /Identity-H /DescendantFonts [8 0 R] /ToUnicode 7 0 R >>"),
        7: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
        # CID metrics: /W list form for 1-2, range form for 3 and 16-17,
        # /DW default for everything else (codes 0x20,0x21)
        8: (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /NOTO+Fake "
            b"/DW 800 /W [1 [600 500] 3 3 250 16 17 1000] >>"),
    }
    write_classic_pdf("type0.pdf", objs)
    expected["type0.pdf"] = "Hi 中文 ok"


def build_diffs():
    # /Differences: 200 -> eacute, 201 -> fi ligature; octal escapes \310 \311
    content = b"BT /F1 12 Tf 72 700 Td (caf\310 \311nish) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 6 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        6: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
            b"/Encoding << /BaseEncoding /WinAnsiEncoding "
            b"/Differences [200 /eacute /fi] >> >>"),
    }
    write_classic_pdf("diffs.pdf", objs)
    expected["diffs.pdf"] = "café ﬁnish"


def build_type0_pii():
    # the 2-byte REDACTION path: ASCII text carried in a Type0 font
    # (identity-ascii ToUnicode bfranges) - the shape subset-embedded fonts
    # produce; PdfRewrite must splice 2-byte glyph pairs out of hex strings
    cmap = b"""begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
3 beginbfrange
<0020> <007E> <0020>
<0100> <0100> <4E2D>
<0101> <0101> <6587>
endbfrange
endcmap"""
    line1 = "id A123456789 here"
    line2 = "plain words only"
    def codes(t):
        return "".join(f"{ord(c):04X}" for c in t).encode()
    content = (b"BT /F1 12 Tf 72 700 Td <" + codes(line1) + b"> Tj ET\n"
               b"BT /F1 12 Tf 72 680 Td <" + codes(line2) + b"> Tj ET")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 6 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        6: (b"<< /Type /Font /Subtype /Type0 /BaseFont /SUBSET+CJK "
            b"/Encoding /Identity-H /DescendantFonts [8 0 R] /ToUnicode 7 0 R >>"),
        7: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cmap), cmap),
        8: (b"<< /Type /Font /Subtype /CIDFontType2 /DW 500 >>"),
    }
    write_classic_pdf("type0_pii.pdf", objs)
    expected["type0_pii.pdf"] = f"{line1}\n{line2}"


def build_kern():
    # TeX-style: words separated only by kern adjustments; /Widths present
    content = (b"BT /F1 10 Tf 72 700 Td "
               b"[(ID)-333(A123456789)-333(leaked)] TJ "
               b"0 -14 Td [(tight)-50(kern)] TJ ET")
    widths = b" ".join(b"500" for _ in range(95))
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R "
            b"/Resources << /Font << /F1 6 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content), content),
        6: (b"<< /Type /Font /Subtype /Type1 /BaseFont /ABCDEF+Times-Roman "
            b"/FirstChar 32 /LastChar 126 /Widths [%s] >>" % widths),
    }
    write_classic_pdf("kern.pdf", objs)
    # -333 >= space-gap threshold -> space; -50 is a letter kern -> no space
    expected["kern.pdf"] = "ID A123456789 leaked\ntightkern"


def write_classic_pdf(name, objs):
    """Serialize objects with a classic xref table + trailer."""
    buf = b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n"
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n%s\nendobj\n" % (num, objs[num])
    xref_pos = len(buf)
    maxobj = max(objs) + 1
    buf += b"xref\n0 %d\n" % maxobj
    buf += b"0000000000 65535 f \n"
    for num in range(1, maxobj):
        if num in offsets:
            buf += b"%010d 00000 n \n" % offsets[num]
        else:
            buf += b"0000000000 65535 f \n"
    buf += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (maxobj, xref_pos))
    with open(os.path.join(OUT, name), "wb") as f:
        f.write(buf)
    print("wrote", name, len(buf), "bytes")


build_classic()
build_objstm()
build_filters()
build_type0()
build_diffs()
build_type0_pii()
build_kern()

with open(os.path.join(OUT, "expected.json"), "w") as f:
    json.dump(expected, f, ensure_ascii=False, indent=1)
print("wrote expected.json")
