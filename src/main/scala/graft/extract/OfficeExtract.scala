package graft.extract

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

/** DOCX (S8) and PPTX (S10) extraction/rewrite from scratch — zip + XML, no
  * office libs (the same approach that closed XLSX).
  *
  * DOCX clones `handlers/docx.py:13-32`: one segment per body paragraph —
  * EMPTY paragraphs included (python-docx `doc.paragraphs` keeps them) —
  * text = concatenated run texts; separator "\n". Rebuild (`docx.py:34-97`):
  * replace ALL occurrences of every mapped entity in each paragraph (no
  * anchors — the reference's "best-effort" path).
  *
  * PPTX clones `handlers/pptx.py:13-46`: per slide in presentation order,
  * per shape with a text frame; shape text = "\n"-joined paragraph texts,
  * stripped, empties skipped. Rebuild (`pptx.py:48-104`): replace-all per
  * shape.
  *
  * Supported subset: run text `<w:t>` / `<a:t>` plus `<w:tab/>` (→ "\t") and
  * `<w:br/>` (→ "\n") — the machine-generated fixture class; styles, tables,
  * headers are out of scope like the rest of the binary-office surface.
  */
object OfficeZip {
  /** Corruption-tolerant: a truncated/garbage archive yields the entries
    * parsed so far (possibly none) — at corpus scale a bad document must
    * degrade to empty, not kill the stage.
    */
  def entries(bytes: Array[Byte]): Map[String, String] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, String]
    try {
      var e: ZipEntry = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory)
          out += e.getName -> new String(zis.readAllBytes(), StandardCharsets.UTF_8)
        e = zis.getNextEntry
      }
    } catch {
      case _: java.io.IOException | _: IllegalArgumentException => // truncated/garbage
    } finally zis.close()
    out.result()
  }

  def zip(files: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    files.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  def unescape(s: String): String = XlsxExtract.unescape(s)
}

object DocxExtract {

  /** Body paragraph texts in document order (empties kept). */
  def paragraphs(docx: Array[Byte]): Seq[String] = {
    val xml = OfficeZip.entries(docx).getOrElse("word/document.xml", "")
    val pRe = java.util.regex.Pattern.compile("<w:p[ >](.*?)</w:p>|<w:p/>",
      java.util.regex.Pattern.DOTALL)
    // tab/br/cr first, and `w:t` must be followed by space or '>' so the
    // pattern cannot swallow `<w:tab/>`; python-docx maps tab→"\t" and both
    // br and cr→"\n"
    val runRe = java.util.regex.Pattern.compile(
      "<w:tab/>|<w:br/>|<w:cr/>|<w:t(?:\\s[^>]*)?>(.*?)</w:t>", java.util.regex.Pattern.DOTALL)
    val out = Seq.newBuilder[String]
    val m = pRe.matcher(xml)
    while (m.find()) {
      val body = Option(m.group(1)).getOrElse("")
      val rm = runRe.matcher(body)
      val sb = new java.lang.StringBuilder
      while (rm.find()) {
        if (rm.group(0) == "<w:tab/>") sb.append('\t')
        else if (rm.group(0) == "<w:br/>" || rm.group(0) == "<w:cr/>") sb.append('\n')
        else sb.append(OfficeZip.unescape(rm.group(1)))
      }
      out += sb.toString
    }
    out.result()
  }

  /** One segment per paragraph, "\n" separator (`docx.py:21-31`). */
  def extract(docx: Array[Byte]): Segments.Doc = {
    val specs = paragraphs(docx).map(t => Segments.Spec(t))
    Segments.build(if (specs.nonEmpty) specs else Seq(Segments.Spec("")), "\n")
  }

  /** Best-effort rebuild: replace ALL occurrences of every mapped entity in
    * each paragraph (`docx.py:64-86`), re-serialize.
    */
  def rewrite(
      docx: Array[Byte],
      replacements: Seq[(String, String)]
  ): Array[Byte] = {
    val out = paragraphs(docx).map { text =>
      replacements.foldLeft(text) { case (t, (orig, repl)) => t.replace(orig, repl) }
    }
    DocxBuilder.build(out)
  }
}

object DocxBuilder {
  /** Minimal one-part document: one `<w:p>` per paragraph. Round-trips
    * through [[DocxExtract.extract]] (spec-pinned).
    */
  def build(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map { p =>
      if (p.isEmpty) "<w:p/>"
      else {
        val runs = p.split("\n", -1).map { line =>
          line.split("\t", -1).map(seg =>
            s"""<w:t xml:space="preserve">${OfficeZip.escape(seg)}</w:t>""")
            .mkString("<w:tab/>")
        }.mkString("<w:br/>")
        s"<w:p><w:r>$runs</w:r></w:p>"
      }
    }.mkString
    OfficeZip.zip(Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
          """</Relationships>"""),
      "word/document.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
          body + """</w:body></w:document>""")))
  }
}

object PptxExtract {

  /** (slideIndex, shapeText) in presentation order; shape text stripped,
    * empties skipped (`pptx.py:21-36`).
    */
  def shapeTexts(pptx: Array[Byte]): Seq[(Int, String)] = {
    val entries = OfficeZip.entries(pptx)
    val slideNames = entries.keys.filter(_.matches("ppt/slides/slide\\d+\\.xml")).toSeq
      .sortBy(n => n.replaceAll("\\D", "").toInt)
    val spRe = java.util.regex.Pattern.compile("<p:sp>(.*?)</p:sp>",
      java.util.regex.Pattern.DOTALL)
    val paraRe = java.util.regex.Pattern.compile("<a:p>(.*?)</a:p>|<a:p/>",
      java.util.regex.Pattern.DOTALL)
    val tRe = java.util.regex.Pattern.compile("<a:t>(.*?)</a:t>",
      java.util.regex.Pattern.DOTALL)
    slideNames.zipWithIndex.flatMap { case (name, slideIdx) =>
      val xml = entries(name)
      val sm = spRe.matcher(xml)
      val out = Seq.newBuilder[(Int, String)]
      while (sm.find()) {
        val pm = paraRe.matcher(sm.group(1))
        val paras = Seq.newBuilder[String]
        while (pm.find()) {
          val tm = tRe.matcher(Option(pm.group(1)).getOrElse(""))
          val sb = new java.lang.StringBuilder
          while (tm.find()) sb.append(OfficeZip.unescape(tm.group(1)))
          paras += sb.toString
        }
        // python-pptx shape.text = "\n".join(paragraph texts); then strip
        val text = paras.result().mkString("\n").strip()
        if (text.nonEmpty) out += slideIdx -> text
      }
      out.result()
    }
  }

  def extract(pptx: Array[Byte]): Segments.Doc = {
    val specs = shapeTexts(pptx).map { case (_, t) => Segments.Spec(t) }
    Segments.build(if (specs.nonEmpty) specs else Seq(Segments.Spec("")), "\n")
  }

  /** Replace-all per shape (`pptx.py:85-99`), re-serialize. */
  def rewrite(
      pptx: Array[Byte],
      replacements: Seq[(String, String)]
  ): Array[Byte] = {
    val rewritten = shapeTexts(pptx).map { case (slide, text) =>
      slide -> replacements.foldLeft(text) { case (t, (o, r)) => t.replace(o, r) }
    }
    PptxBuilder.build(rewritten)
  }
}

object PptxBuilder {
  /** Minimal deck: shapes grouped into slides by index. Round-trips through
    * [[PptxExtract.extract]].
    */
  def build(shapes: Seq[(Int, String)]): Array[Byte] = {
    val bySlide = shapes.groupBy(_._1).toSeq.sortBy(_._1)
    val slideFiles = bySlide.zipWithIndex.map { case ((_, ss), i) =>
      val sps = ss.map { case (_, text) =>
        val paras = text.split("\n", -1).map(p =>
          s"""<a:p><a:r><a:t>${OfficeZip.escape(p)}</a:t></a:r></a:p>""").mkString
        s"""<p:sp><p:txBody>$paras</p:txBody></p:sp>"""
      }.mkString
      s"ppt/slides/slide${i + 1}.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"><p:cSld><p:spTree>""" +
          sps + """</p:spTree></p:cSld></p:sld>""")
    }
    OfficeZip.zip(Seq(
      "[Content_Types].xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
          """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
          """<Default Extension="xml" ContentType="application/xml"/>""" +
          """<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>""" +
          slideFiles.indices.map(i =>
            s"""<Override PartName="/ppt/slides/slide${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>""").mkString +
          """</Types>"""),
      "_rels/.rels" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
          """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>""" +
          """</Relationships>"""),
      "ppt/presentation.xml" ->
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>""")) ++ slideFiles)
  }
}
