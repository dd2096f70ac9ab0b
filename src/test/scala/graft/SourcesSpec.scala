package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.extract.Segments
import graft.model.Entity
import graft.sources.Sources
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class SourcesSpec extends AnyFunSuite {

  private val root = {
    val in = getClass.getResourceAsStream("/golden_anchors.json")
    require(in != null)
    try new ObjectMapper().readTree(in) finally in.close()
  }

  test("P1 segment build matches reference offsets (incl. empty segment)") {
    val specs = Seq(
      Segments.Spec("first page text", pageIndex = Some(0), bbox = Some(Seq(0, 0, 100, 20))),
      Segments.Spec("second 頁 text", pageIndex = Some(1), bbox = Some(Seq(0, 30, 100, 50))),
      Segments.Spec("third", pageIndex = Some(2)),
      Segments.Spec("", pageIndex = Some(3)),
      Segments.Spec("cell", cell = Some(Map("sheet" -> "csv", "row" -> "1",
        "col" -> "2", "address" -> "R1C2")))
    )
    val doc = Segments.build(specs)
    assert(doc.text == root.get("doc_text").asText())
    val want = root.get("segments").elements().asScala.toSeq
    assert(doc.segments.length == want.length)
    doc.segments.zip(want).foreach { case (g, w) =>
      assert(g.segment_id == w.get("id").asInt() && g.start == w.get("start").asInt()
        && g.end == w.get("end").asInt() && g.text == w.get("text").asText(), s"$g vs $w")
    }
  }

  test("A1 anchor attach matches reference (containment + bisect semantics)") {
    val specs = Seq(
      Segments.Spec("first page text", pageIndex = Some(0), bbox = Some(Seq(0, 0, 100, 20))),
      Segments.Spec("second 頁 text", pageIndex = Some(1), bbox = Some(Seq(0, 30, 100, 50))),
      Segments.Spec("third", pageIndex = Some(2)),
      Segments.Spec("", pageIndex = Some(3)),
      Segments.Spec("cell", cell = Some(Map("sheet" -> "csv", "row" -> "1",
        "col" -> "2", "address" -> "R1C2")))
    )
    val doc = Segments.build(specs)
    root.get("anchored").elements().asScala.foreach { w =>
      val start = w.get("span").get(0).asInt()
      val end = w.get("span").get(1).asInt()
      val e = Entity("X", 1.0, 1.0, "t", "zh", start, end, "")
      val seg = Segments.anchorOf(e, doc.segments)
      val wantPage = Option(w.get("page")).filterNot(_.isNull).map(_.asInt())
      assert(seg.flatMap(_.page_index) == wantPage, s"span=($start,$end) got=$seg")
      val wantBbox = Option(w.get("bbox")).filterNot(_.isNull)
        .map(_.elements().asScala.map(_.asInt()).toSeq)
      assert(seg.flatMap(_.bbox) == wantBbox, s"span=($start,$end)")
    }
  }

  test("S7 CSV cell-per-segment extraction matches reference") {
    val csv = root.get("csv")
    val doc = Sources.csvSegments(csv.get("text").asText())
    assert(doc.text == csv.get("doc_text").asText())
    val want = csv.get("segments").elements().asScala.toSeq
    assert(doc.segments.length == want.length,
      s"got=${doc.segments.map(_.text)} want=${want.map(_.get("text").asText())}")
    doc.segments.zip(want).foreach { case (g, w) =>
      assert(g.text == w.get("text").asText() && g.start == w.get("start").asInt()
        && g.end == w.get("end").asInt(), s"$g vs $w")
      val wantCell = w.get("cell").properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
      assert(g.cell.contains(wantCell))
    }
  }

  test("A4 cell rewrite replaces first occurrence via replacement map") {
    val csvText = "id,phone\nA123456789,0912345678 and 0912345678\n"
    val rewritten = Sources.rewriteCells(
      csvText,
      Seq(
        (Map("row" -> "2", "col" -> "1"), "ID", "A123456789"),
        (Map("row" -> "2", "col" -> "2"), "PHONE", "0912345678"),
        (Map("row" -> "9", "col" -> "9"), "ID", "nope")
      ),
      Map("ID:A123456789" -> "B987654321", "PHONE:0912345678" -> "0999888777"))
    assert(rewritten(1)(0) == "B987654321")
    assert(rewritten(1)(1) == "0999888777 and 0912345678") // first occurrence only
  }

  test("S11/S12 JSONL readers: schema, id fallback chain, join") {
    val spark = SparkTestBase.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/span.jsonl"),
      """{"text":"ID A123456789","entities":[{"type":"ID","span":[3,13],"text":"A123456789","confidence":1.0,"score":1.0,"source":"synthetic","language":"zh"}]}
        |{"text":"no entities","entities":[]}
        |""".stripMargin)
    val spans = Sources.readSpanExamples(spark, s"$dir/span.jsonl")
    assert(spans.count() == 2)
    assert(spans.selectExpr("size(entities)").collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1))

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/ex.jsonl"),
      """{"id":"a","input":"x","output":"y"}
        |{"_id":"b","input":"x2"}
        |{"example_id":"c","output":"y3"}
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/pred.jsonl"),
      """{"id":"a","prediction":"p1"}
        |{"example_id":"b","output":"p2"}
        |""".stripMargin)
    val ex = Sources.readDeidExamples(spark, s"$dir/ex.jsonl")
    assert(ex.select("example_id").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "b", "c"))
    val joined = Sources.joinEvalPairs(ex, Sources.readDeidPredictions(spark, s"$dir/pred.jsonl"))
    assert(joined.count() == 2)
    assert(joined.where("example_id = 'b'").select("prediction_text")
      .first().getString(0) == "p2")
  }
}
