package graft.training

import graft.model.SpanEnt
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S14 — token-NER dataset adapters
  * (`/root/reference/src/deid_pipeline/training/datasets.py:11-275`).
  *
  * The reference loads HF datasets (network-gated; it equally accepts a
  * local path, `datasets.py:30-38`). The Spark-native form reads the same
  * rows from JSONL/parquet with an explicit schema; the HF hub download
  * itself stays out of scope (zero egress). Everything downstream is cloned:
  *
  *  - field inference chain `tokens` / `ner_tags` / `tags`
  *    (`datasets.py:136-149`);
  *  - integer tag ids resolved through a label list (WikiAnn's baked list
  *    when the dataset is `tner/wikiann`, `datasets.py:19-27,152-162`);
  *  - `normalize_bio_tag` (`:69-80`): base type through
  *    `CANONICAL_ENTITY_MAP`, B-/I- prefix preserved;
  *  - `iter_token_examples_to_span_examples` (`:185-275`): join tokens with
  *    a separator, walk BIO tags into char-offset span entities ("O" or a
  *    type change closes; B- always starts fresh; bare I- after a different
  *    type starts a NEW entity — the reference's `current_type != ent_type`
  *    branch).
  */
object DatasetAdapters {

  /** `CANONICAL_ENTITY_MAP` (`datasets.py:11-17`). */
  val canonicalEntityMap: Map[String, String] = Map(
    "PER" -> "NAME", "PERSON" -> "NAME", "LOC" -> "ADDRESS", "GPE" -> "ADDRESS",
    "ORG" -> "ORGANIZATION")

  /** `WIKIANN_ID2LABEL` (`datasets.py:19-27`). */
  val wikiannId2Label: IndexedSeq[String] =
    IndexedSeq("B-LOC", "B-ORG", "B-PER", "I-LOC", "I-ORG", "I-PER", "O")

  /** `normalize_bio_tag` (`datasets.py:69-80`). */
  def normalizeBioTag(tag: String): String = {
    val raw = Option(tag).getOrElse("O").trim
    if (raw == "O" || raw.isEmpty) return if (raw.isEmpty) "O" else raw
    val prefix = if (raw.startsWith("B-")) "B-" else if (raw.startsWith("I-")) "I-" else ""
    val base = raw.substring(prefix.length)
    val mapped = canonicalEntityMap.getOrElse(base, base)
    if (prefix.nonEmpty) s"$prefix$mapped" else mapped
  }

  final case class TokenNERExample(tokens: Seq[String], tags: Seq[String])

  /** Token-NER reader over local JSONL: infers the token/tag fields, maps
    * integer tag ids through `id2label`, normalizes tags. Returns
    * (tokens array<string>, tags array<string>).
    */
  def readTokenNer(
      spark: SparkSession,
      path: String,
      tokensField: String = "tokens",
      tagsField: String = "ner_tags",
      id2label: Option[Seq[String]] = Some(wikiannId2Label)
  ): DataFrame = {
    val schema = StructType(Seq(
      StructField("tokens", ArrayType(StringType)),
      StructField("ner_tags", ArrayType(StringType)),
      StructField("tags", ArrayType(StringType))))
    val raw = spark.read.schema(schema).json(path)
    val toks = Seq(tokensField, "tokens").distinct
      .map(col).reduceLeft((a, b) => coalesce(a, b))
    val tags = Seq(tagsField, "ner_tags", "tags").distinct
      .map(col).reduceLeft((a, b) => coalesce(a, b))
    val labels = id2label.getOrElse(wikiannId2Label)
    val labelsCol = array(labels.map(lit): _*) // reflection-free (console-safe)
    // ids arrive as strings under the permissive schema; digits ⇒ id path
    val resolved = transform(tags, t =>
      when(t.rlike("^\\d+$"), element_at(labelsCol, t.cast("int") + 1)).otherwise(t))
    val normalize = udf((ts: Seq[String]) => ts.map(normalizeBioTag))
    raw.select(toks.as("tokens"), normalize(resolved).as("tags"))
      .where(col("tags").isNotNull && size(col("tags")) > 0)
  }

  /** `iter_token_examples_to_span_examples` (`datasets.py:185-275`) for one
    * example; offsets are code points (Python string indexes).
    */
  def tokensToSpans(
      tokens: Seq[String],
      tags: Seq[String],
      separator: String = " "
  ): (String, List[SpanEnt]) = {
    val sb = new java.lang.StringBuilder
    val spans = Array.newBuilder[(Int, Int)]
    var cursor = 0
    val sepLen = separator.codePointCount(0, separator.length)
    tokens.zipWithIndex.foreach { case (tok, i) =>
      if (i > 0) { sb.append(separator); cursor += sepLen }
      val len = tok.codePointCount(0, tok.length)
      spans += ((cursor, cursor + len))
      sb.append(tok)
      cursor += len
    }
    val text = sb.toString
    val out = scala.collection.mutable.ListBuffer.empty[SpanEnt]
    var curTyp: String = null
    var curStart = -1
    var curEnd = -1
    def close(): Unit = {
      if (curTyp != null) out += SpanEnt(curStart, curEnd, curTyp, 1.0, "token_ner")
      curTyp = null
    }
    tags.zip(spans.result()).foreach { case (tag, (s, e)) =>
      if (tag == "O") close()
      else {
        val prefix = if (tag.startsWith("B-")) "B" else if (tag.startsWith("I-")) "I" else ""
        val typ = if (tag.contains("-")) tag.split("-", 2)(1) else tag
        if (prefix == "B" || curTyp != typ) {
          close()
          curTyp = typ
          curStart = s
          curEnd = e
        } else curEnd = e
      }
    }
    close()
    (text, out.toList)
  }

  /** Distributed span-example conversion: (text, entities) rows. */
  def toSpanExamples(tokenNer: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    tokenNer.select(col("tokens"), col("tags"))
      .as[(Seq[String], Seq[String])]
      .map { case (toks, tags) => tokensToSpans(toks, tags) }
      .toDF("text", "entities")
  }
}
