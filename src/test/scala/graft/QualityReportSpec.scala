package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.metrics.QualityReport
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class QualityReportSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("analyze_span_examples report parity on a corrupted synthetic corpus") {
    val in = getClass.getResourceAsStream("/golden_quality_report.json")
    require(in != null)
    val root = try new ObjectMapper().readTree(in) finally in.close()

    val entSchema = StructType(Seq(
      StructField("typ", StringType), StructField("start", IntegerType),
      StructField("end", IntegerType), StructField("text", StringType)))
    val schema = StructType(Seq(
      StructField("text", StringType),
      StructField("entities", ArrayType(entSchema))))
    val rows = root.get("examples").elements().asScala.map { e =>
      val ents = e.get("entities").elements().asScala.map { t =>
        Row(
          Option(t.get("type")).map(_.asText()).orNull,
          t.get("span").get(0).asInt(), t.get("span").get(1).asInt(),
          Option(t.get("text")).map(_.asText()).orNull)
      }.toSeq
      Row(e.get("text").asText(), ents)
    }.toSeq
    val df = spark.createDataFrame(rows.asJava, schema)

    val rep = QualityReport.analyze(spark, df)
    val want = root.get("report")

    val s = rep.summary.collect().head
    assert(s.getAs[Long]("examples") == want.get("examples").asLong())
    assert(s.getAs[Long]("entities") == want.get("entities").asLong())
    assert(s.getAs[Long]("invalid_examples") == want.get("invalid_examples").asLong())
    assert(s.getAs[Long]("invalid_entities") == want.get("invalid_entities").asLong())

    val gotIssues = rep.issueCounts.collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("cnt")).toMap
    val wantIssues = want.get("issue_counts").properties().asScala
      .map(e => e.getKey -> e.getValue.asLong()).toMap
    assert(gotIssues == wantIssues)

    val gotTypes = rep.entityTypeCounts.collect()
      .map(r => r.getAs[String]("typ") -> r.getAs[Long]("cnt")).toMap
    val wantTypes = want.get("entity_type_counts").properties().asScala
      .map(e => e.getKey -> e.getValue.asLong()).toMap
    assert(gotTypes == wantTypes)

    def checkSummary(df: org.apache.spark.sql.DataFrame, key: String): Unit = {
      val r = df.collect().head
      val w = want.get(key)
      assert(r.getAs[Double]("min") == w.get("min").asDouble(), s"$key.min")
      assert(r.getAs[Double]("max") == w.get("max").asDouble(), s"$key.max")
      assert(math.abs(r.getAs[Double]("mean") - w.get("mean").asDouble()) < 1e-9, s"$key.mean")
      assert(r.getAs[Double]("p50") == w.get("p50").asDouble(), s"$key.p50")
      assert(r.getAs[Double]("p95") == w.get("p95").asDouble(), s"$key.p95")
    }
    checkSummary(rep.textLength, "text_length")
    checkSummary(rep.entitiesPerExample, "entities_per_example")
    checkSummary(rep.entitySpanLength, "entity_span_length")
  }
}
