package graft.extract

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

/** XLSX extraction from scratch (S9) — zip + sheet XML, no office libs.
  *
  * Clones the observable behavior of the reference's openpyxl path
  * (`/root/reference/src/deid_pipeline/handlers/xlsx.py:13-51`): iterate
  * sheets in workbook order, cells row-major; every cell with a non-empty
  * value becomes one segment with anchor
  * `{sheet, address (A1-style), row, col}`; segments join with "\n"
  * (`Segments.build`). Rebuild (`xlsx.py:53-117`) replaces the FIRST
  * occurrence of each anchored entity's original inside its cell value and
  * re-serializes the workbook.
  *
  * Supported subset (the machine-generated fixture class): xl/workbook.xml
  * sheet list + xl/_rels for sheet targets, sharedStrings (`t="s"`), inline
  * strings (`t="inlineStr"`), formula-string (`t="str"`) and numeric cells.
  * No styles, merged cells, or dates — out of v1 scope like the other
  * binary-office formats (SURVEY §7.6); this closes the one that needs no
  * native deps.
  */
object XlsxExtract {

  final case class Cell(sheet: String, row: Int, col: Int, address: String, text: String)

  /** Cells in reference iteration order (sheet order, then row-major). */
  def cells(xlsx: Array[Byte]): Seq[Cell] = {
    val entries = zipEntries(xlsx)
    val shared = entries.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
    val sheets = sheetTargets(entries)
    sheets.flatMap { case (name, target) =>
      entries.get(target).toSeq.flatMap(parseSheet(_, name, shared))
    }
  }

  /** The extract contract: one segment per non-empty cell, "\n" separator
    * (`xlsx.py:21-51`).
    */
  def extract(xlsx: Array[Byte]): Segments.Doc = {
    val specs = cells(xlsx).map { c =>
      Segments.Spec(c.text, cell = Some(Map(
        "sheet" -> c.sheet,
        "address" -> c.address,
        "row" -> c.row.toString,
        "col" -> c.col.toString)))
    }
    Segments.build(if (specs.nonEmpty) specs else Seq(Segments.Spec("")), "\n")
  }

  /** A4/K-rebuild: first-occurrence cell-targeted replacement
    * (`xlsx.py:84-107`), then re-serialize via [[XlsxBuilder]]. Input
    * entities: (cell anchor map, type, original text).
    */
  def rewrite(
      xlsx: Array[Byte],
      entities: Seq[(Map[String, String], String, String)],
      replacementMap: Map[String, String]
  ): Array[Byte] = {
    val all = cells(xlsx)
    val byKey = mutable.LinkedHashMap.empty[(String, String), Cell]
    all.foreach(c => byKey((c.sheet, c.address)) = c)
    entities.foreach { case (anchor, typ, original) =>
      (anchor.get("sheet"), anchor.get("address")) match {
        case (Some(sheet), Some(addr)) if typ.nonEmpty && original.nonEmpty =>
          replacementMap.get(s"$typ:$original").foreach { repl =>
            byKey.get((sheet, addr)).foreach { c =>
              val idx = c.text.indexOf(original)
              if (idx >= 0)
                byKey((sheet, addr)) = c.copy(text =
                  c.text.substring(0, idx) + repl + c.text.substring(idx + original.length))
            }
          }
        case _ =>
      }
    }
    val bySheet = byKey.values.toSeq.groupBy(_.sheet)
    val sheetOrder = all.map(_.sheet).distinct
    XlsxBuilder.build(sheetOrder.map(s => s -> bySheet.getOrElse(s, Nil)))
  }

  // ---- zip + xml plumbing ---------------------------------------------

  private def zipEntries(bytes: Array[Byte]): Map[String, String] =
    OfficeZip.entries(bytes)

  /** workbook.xml sheet list (name + r:id) resolved through the rels file to
    * worksheet part names; falls back to xl/worksheets/sheetN.xml by order.
    */
  private def sheetTargets(entries: Map[String, String]): Seq[(String, String)] = {
    val wb = entries.getOrElse("xl/workbook.xml", "")
    val rels = entries.getOrElse("xl/_rels/workbook.xml.rels", "")
    val relMap = {
      val m = java.util.regex.Pattern.compile(
        "<Relationship[^>]*Id=\"([^\"]+)\"[^>]*Target=\"([^\"]+)\"").matcher(rels)
      val b = Map.newBuilder[String, String]
      while (m.find()) b += m.group(1) -> ("xl/" + m.group(2).stripPrefix("/xl/").stripPrefix("xl/"))
      b.result()
    }
    val sheetRe = java.util.regex.Pattern.compile(
      "<sheet[^>]*name=\"([^\"]+)\"[^>]*r:id=\"([^\"]+)\"[^>]*/?>")
    val m = sheetRe.matcher(wb)
    val out = Seq.newBuilder[(String, String)]
    var i = 1
    while (m.find()) {
      val target = relMap.getOrElse(m.group(2), s"xl/worksheets/sheet$i.xml")
      out += unescape(m.group(1)) -> target
      i += 1
    }
    out.result()
  }

  private def parseSharedStrings(xml: String): Vector[String] = {
    // one <si>…</si> per shared string; concat its <t> runs (rich text)
    val si = java.util.regex.Pattern.compile("<si>(.*?)</si>", java.util.regex.Pattern.DOTALL)
    val t = java.util.regex.Pattern.compile("<t[^>]*>(.*?)</t>", java.util.regex.Pattern.DOTALL)
    val out = Vector.newBuilder[String]
    val m = si.matcher(xml)
    while (m.find()) {
      val tm = t.matcher(m.group(1))
      val sb = new java.lang.StringBuilder
      while (tm.find()) sb.append(unescape(tm.group(1)))
      out += sb.toString
    }
    out.result()
  }

  private def parseSheet(xml: String, sheet: String, shared: Vector[String]): Seq[Cell] = {
    val cellRe = java.util.regex.Pattern.compile(
      "<c\\s+[^>]*r=\"([A-Z]+)(\\d+)\"([^>]*?)(?:/>|>(.*?)</c>)",
      java.util.regex.Pattern.DOTALL)
    val vRe = java.util.regex.Pattern.compile("<v>(.*?)</v>", java.util.regex.Pattern.DOTALL)
    val isRe = java.util.regex.Pattern.compile("<is>\\s*<t[^>]*>(.*?)</t>", java.util.regex.Pattern.DOTALL)
    val m = cellRe.matcher(xml)
    val out = Seq.newBuilder[Cell]
    while (m.find()) {
      val colLetters = m.group(1)
      val row = m.group(2).toInt
      val attrs = Option(m.group(3)).getOrElse("")
      val body = Option(m.group(4)).getOrElse("")
      val tAttr = {
        val tm = java.util.regex.Pattern.compile("t=\"([^\"]+)\"").matcher(attrs)
        if (tm.find()) tm.group(1) else ""
      }
      val text = tAttr match {
        case "s" =>
          val vm = vRe.matcher(body)
          if (vm.find()) shared.lift(vm.group(1).trim.toInt).getOrElse("") else ""
        case "inlineStr" =>
          val im = isRe.matcher(body)
          if (im.find()) unescape(im.group(1)) else ""
        case _ => // "str", "n", or untyped numeric
          val vm = vRe.matcher(body)
          if (vm.find()) unescape(vm.group(1)) else ""
      }
      if (text.nonEmpty)
        out += Cell(sheet, row, colIndex(colLetters), s"$colLetters$row", text)
    }
    out.result()
  }

  /** "A"→1, "AA"→27 (openpyxl's cell.column is 1-based). */
  def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1))

  def colLetters(idx: Int): String = {
    var n = idx
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private[extract] def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")
}

/** Deterministic minimal XLSX serializer — the fixture/rebuild writer side
  * of [[XlsxExtract]] (inline strings, no styles). Output re-extracts to the
  * same cells (round-trip pinned in the spec).
  */
object XlsxBuilder {

  /** sheets: ordered (name, cells). Cell addresses must be well-formed. */
  def build(sheets: Seq[(String, Seq[XlsxExtract.Cell])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes(StandardCharsets.UTF_8))
      zip.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        sheets.indices.map(i =>
          s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
        """</Types>""")
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${escape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString + """</sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString +
        """</Relationships>""")
    sheets.zipWithIndex.foreach { case ((_, cs), i) =>
      val rows = cs.groupBy(_.row).toSeq.sortBy(_._1).map { case (r, rowCells) =>
        val cellsXml = rowCells.sortBy(_.col).map { c =>
          s"""<c r="${c.address}" t="inlineStr"><is><t xml:space="preserve">${escape(c.text)}</t></is></c>"""
        }.mkString
        s"""<row r="$r">$cellsXml</row>"""
      }.mkString
      put(s"xl/worksheets/sheet${i + 1}.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
          rows + """</sheetData></worksheet>""")
    }
    zip.close()
    bos.toByteArray
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")
}
