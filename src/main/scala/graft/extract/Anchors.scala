package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A3 — char-offset → bbox union for OCR-anchored entities
  * (`/root/reference/src/deid_pipeline/image_deid/processor.py:115-144`):
  * per entity span, union the page-0 bboxes of its characters
  * (min left/top, max right/bottom). The offset map is
  * `array<struct<pos:int, page:int, l:int, t:int, r:int, b:int>>` per row.
  *
  * Pure column algebra (HOFs) — no UDF, no shuffle; at scale this is the
  * `groupBy(entity) → min/max` aggregation pattern of SURVEY §2.5.
  */
object Anchors {

  /** bbox = [minL, minT, maxR, maxB] of offset-map chars within [start, end)
    * on page 0; null when no char of the span is mapped.
    */
  def bboxUnion(offsetMap: Column, start: Column, end: Column): Column = {
    val inSpan = filter(offsetMap, p =>
      p.getField("pos") >= start && p.getField("pos") < end &&
        p.getField("page") === 0)
    when(size(inSpan) === 0, lit(null))
      .otherwise(array(
        array_min(transform(inSpan, p => p.getField("l"))),
        array_min(transform(inSpan, p => p.getField("t"))),
        array_max(transform(inSpan, p => p.getField("r"))),
        array_max(transform(inSpan, p => p.getField("b")))))
  }

  /** Attach unioned bboxes to an exploded entities frame. */
  def attachBboxes(df: DataFrame,
      offsetMapCol: String = "offset_map",
      startCol: String = "start",
      endCol: String = "end"): DataFrame =
    df.withColumn("bbox", bboxUnion(col(offsetMapCol), col(startCol), col(endCol)))
      .withColumn("page_index", when(col("bbox").isNotNull, lit(0)))
}

/** F7/F8 — misc scalar helpers. */
object Misc {

  /** `dataset_slug` (`storage/layout.py:18-24`). */
  def datasetSlug(name: String): String = {
    val cleaned = Option(name).getOrElse("").trim
    if (cleaned.isEmpty) "unknown"
    else cleaned.replace("/", "__").replace(":", "__").replace(" ", "_")
  }
}
