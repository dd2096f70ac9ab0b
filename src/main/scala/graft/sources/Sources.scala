package graft.sources

import graft.extract.Segments
import graft.model.Segment
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sources / scans (SURVEY §2.1) re-expressed on Spark readers. Explicit
  * schemas everywhere — never inference on the hot path (§1.3).
  */
object Sources {

  /** S11 — span-example JSONL schema (`training/io.py:51-70`,
    * `training/synthetic.py` output shape).
    */
  val spanExampleSchema: StructType = StructType(Seq(
    StructField("text", StringType),
    StructField("entities", ArrayType(StructType(Seq(
      StructField("type", StringType),
      StructField("span", ArrayType(LongType)),
      StructField("text", StringType),
      StructField("confidence", DoubleType),
      StructField("score", DoubleType),
      StructField("source", StringType),
      StructField("language", StringType)
    ))))
  ))

  def readSpanExamples(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(spanExampleSchema).json(path)

  /** S12 — deid-eval example reader (`training/deid_eval.py:27-48`): id
    * fallback chain id → _id → example_id → uuid → pk → index; input/output
    * null-coalesced to "".
    */
  def readDeidExamples(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("_id", StringType),
      StructField("example_id", StringType), StructField("uuid", StringType),
      StructField("pk", StringType), StructField("index", StringType),
      StructField("input", StringType), StructField("output", StringType)))
    spark.read.schema(schema).json(path)
      .select(
        coalesce(col("id"), col("_id"), col("example_id"), col("uuid"),
          col("pk"), col("index"), lit("")).as("example_id"),
        coalesce(col("input"), lit("")).as("input_text"),
        coalesce(col("output"), lit("")).as("target_text"))
  }

  /** S12 — prediction reader (`deid_eval.py:51-61`): id → example_id → _id;
    * prediction → output.
    */
  def readDeidPredictions(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("example_id", StringType),
      StructField("_id", StringType), StructField("prediction", StringType),
      StructField("output", StringType)))
    spark.read.schema(schema).json(path)
      .select(
        coalesce(col("id"), col("example_id"), col("_id"), lit("")).as("example_id"),
        coalesce(col("prediction"), col("output"), lit("")).as("prediction_text"))
  }

  /** A5 — eval example/prediction equi join (`scripts/evaluate_deid.py`). */
  def joinEvalPairs(examples: DataFrame, predictions: DataFrame): DataFrame =
    examples.join(predictions, Seq("example_id"), "inner")

  /** S7 — CSV extract, cell-per-segment (`handlers/csv.py:14-39`): 1-based
    * (row, col), cell anchor `{sheet: "csv", row, col, address: RrCc}`,
    * separator "\n" between cells in reading order. Per-row pure function
    * over a raw CSV string (one document per row — matches the reference's
    * one-file-one-document model; a whole-file table uses spark.read.csv).
    */
  def csvSegments(csvText: String): Segments.Doc = {
    val rows = parseCsv(csvText)
    val specs = for {
      (row, r) <- rows.zipWithIndex
      (value, c) <- row.zipWithIndex
    } yield Segments.Spec(
      text = Option(value).getOrElse(""),
      cell = Some(Map(
        "sheet" -> "csv",
        "row" -> (r + 1).toString,
        "col" -> (c + 1).toString,
        "address" -> s"R${r + 1}C${c + 1}")))
    Segments.build(if (specs.nonEmpty) specs else Seq(Segments.Spec("")), "\n")
  }

  /** A4 — cell-targeted rewrite (`handlers/csv.py:64-85`): for each entity
    * with a cell anchor, replace the FIRST occurrence of the original in
    * that cell with its mapped replacement.
    */
  def rewriteCells(
      csvText: String,
      entities: Seq[(Map[String, String], String, String)], // (cell, typ, original)
      replacementMap: Map[String, String]
  ): Vector[Vector[String]] = {
    val rows = parseCsv(csvText).map(_.toArray).toArray
    entities.foreach { case (cell, typ, original) =>
      val row = cell.get("row").flatMap(_.toIntOption).getOrElse(0)
      val colI = cell.get("col").flatMap(_.toIntOption).getOrElse(0)
      if (row > 0 && colI > 0 && row <= rows.length && colI <= rows(row - 1).length
        && original.nonEmpty && typ.nonEmpty) {
        replacementMap.get(s"$typ:$original").foreach { repl =>
          val cur = Option(rows(row - 1)(colI - 1)).getOrElse("")
          val idx = cur.indexOf(original)
          if (idx >= 0)
            rows(row - 1)(colI - 1) =
              cur.substring(0, idx) + repl + cur.substring(idx + original.length)
        }
      }
    }
    rows.map(_.toVector).toVector
  }

  /** Minimal RFC-4180 CSV parse (quoted fields, escaped quotes, CRLF). */
  def parseCsv(text: String): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var row = Vector.newBuilder[String]
    val field = new java.lang.StringBuilder
    var inQuotes = false
    var sawAny = false
    var fieldCount = 0
    var i = 0
    def endField(): Unit = { row += field.toString; field.setLength(0); fieldCount += 1 }
    def endRow(): Unit = {
      endField()
      rows += row.result(); row = Vector.newBuilder[String]; fieldCount = 0
    }
    while (i < text.length) {
      val c = text.charAt(i)
      sawAny = true
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field.append('"'); i += 1 }
          else inQuotes = false
        } else field.append(c)
      } else c match {
        case '"' => inQuotes = true
        case ',' => endField()
        case '\r' =>
          if (i + 1 < text.length && text.charAt(i + 1) == '\n') i += 1
          endRow()
        case '\n' => endRow()
        case other => field.append(other)
      }
      i += 1
    }
    if (field.length > 0 || fieldCount > 0) endRow()
    else if (!sawAny) ()
    rows.result()
  }
}
