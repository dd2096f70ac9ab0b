package graft.sources

import graft.extract.{DocxExtract, PdfRedact, PptxExtract, XlsxExtract}
import graft.pipeline.DeidCore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-grained end-to-end job — the Spark realization of the reference's
  * handler-registry dispatch (`handlers/registry.py:16-47` + `main.py`):
  * read a directory of mixed-format documents, route each row to its
  * format's extract→deid→rebuild pipeline, write `{stem}.deid{ext}` outputs.
  *
  * Dispatch is a per-row `CASE` over the extension — one narrow projection,
  * embarrassingly parallel like the turn pipeline; `binaryFile` scans give
  * (path, content) rows and at scale the directory listing parallelizes
  * across executors.
  */
object FilesJob {

  val supportedExtensions: Set[String] =
    Set("txt", "html", "htm", "csv", "xlsx", "docx", "pptx", "pdf")

  private def ext(name: String): String = {
    val dot = name.lastIndexOf('.')
    if (dot > 0) name.substring(dot + 1).toLowerCase else ""
  }

  /** One document → (rebuilt bytes, entity count). Pure; text formats run
    * extract→deid, binary formats their format-preserving rewrite.
    */
  def processOne(
      name: String,
      content: Array[Byte],
      mode: String = "replace",
      lang: String = "zh"
  ): (Array[Byte], Int) = ext(name) match {
    case "csv" =>
      val (out, n) = FormatJobs.rewriteCsvText(
        new String(content, java.nio.charset.StandardCharsets.UTF_8), mode, lang)
      (out.getBytes(java.nio.charset.StandardCharsets.UTF_8), n)
    case "xlsx" => FormatJobs.rewriteXlsx(content, mode, lang)
    case "docx" => FormatJobs.rewriteDocx(content, mode, lang)
    case "pptx" => FormatJobs.rewritePptx(content, mode, lang)
    case "pdf" =>
      // general rewriter: handles real-world PDFs (object streams, fonts,
      // filter chains) as well as the synthetic-builder subset
      val (out, rects) = graft.extract.PdfRewrite.redact(content, lang)
      (out, rects.length)
    case "html" | "htm" =>
      val raw = new String(content, java.nio.charset.StandardCharsets.UTF_8)
      val text = graft.extract.HtmlExtract.getText(raw)
      val r = DeidCore.process(text, mode, lang)
      (r.text.getBytes(java.nio.charset.StandardCharsets.UTF_8), r.entities.length)
    case _ => // txt and unknown-but-text: UTF-8 with replacement (S2)
      val raw = new String(content, java.nio.charset.StandardCharsets.UTF_8)
      val r = DeidCore.process(raw, mode, lang)
      (r.text.getBytes(java.nio.charset.StandardCharsets.UTF_8), r.entities.length)
  }

  /** (path, out_name, n_entities, bytes) frame over a binaryFile scan. */
  def process(
      spark: SparkSession,
      inputDir: String,
      mode: String = "replace",
      lang: String = "zh"
  ): DataFrame = {
    import spark.implicits._
    val glob = supportedExtensions.map(e => s"*.$e").mkString("{", ",", "}")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(inputDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, content) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val (out, n) = processOne(name, content, mode, lang)
        (path, FormatJobs.deidFileName(name), n, out)
      }
      .toDF("path", "out_name", "n_entities", "bytes")
  }

  /** Run and write each rebuilt document to `outputDir/{stem}.deid{ext}`.
    * Returns (files, total entities). Writes happen on executors via the
    * Hadoop FS API — no driver collect; totals are tallied by accumulators
    * during the same write pass, so the extract→deid→rebuild pipeline runs
    * exactly once per document.
    */
  def run(
      spark: SparkSession,
      inputDir: String,
      outputDir: String,
      mode: String = "replace",
      lang: String = "zh"
  ): (Long, Long) = {
    val processed = process(spark, inputDir, mode, lang)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val nFiles = spark.sparkContext.longAccumulator("filesjob.files")
    val nEnts = spark.sparkContext.longAccumulator("filesjob.entities")
    processed.select("out_name", "bytes", "n_entities").rdd
      .foreachPartition { it =>
        val dir = new org.apache.hadoop.fs.Path(outputDir)
        val fs = dir.getFileSystem(conf.value)
        fs.mkdirs(dir)
        it.foreach { row =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(dir, row.getString(0)), true)
          try out.write(row.getAs[Array[Byte]](1))
          finally out.close()
          nFiles.add(1L)
          nEnts.add(row.getInt(2).toLong)
        }
      }
    (nFiles.value, nEnts.value)
  }
}
