package graft.tools

import graft.extract.PdfExtract

/** Scratch probe: run the extractor over real-world PDFs on disk. */
object PdfProbe {
  def main(args: Array[String]): Unit = {
    args.foreach { path =>
      val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      val pages = PdfExtract.extractPages(data)
      println(s"== $path: ${pages.length} pages, needsOcr=${pages.count(_.needsOcr)}")
      val out = java.nio.file.Paths.get("/tmp/pdfprobe_" +
        java.nio.file.Paths.get(path).getFileName.toString + ".txt")
      java.nio.file.Files.write(out,
        pages.map(p => s"-- page ${p.page}\n${p.text}").mkString("\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote $out")
    }
  }
}
