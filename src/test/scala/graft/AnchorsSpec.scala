package graft

import graft.extract.{Anchors, Misc}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnchorsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("A3 bbox union: min/max over page-0 chars in span; null when unmapped") {
    // offset map: char i at bbox; char 2 on page 1 (excluded); char 5 unmapped
    val offsetMap = Seq(
      (0, 0, 10, 20, 18, 30), (1, 0, 18, 20, 26, 30), (2, 1, 0, 0, 8, 10),
      (3, 0, 30, 22, 38, 32), (4, 0, 38, 18, 46, 28))
    val df = Seq((offsetMap, 0, 5), (offsetMap, 5, 9), (offsetMap, 2, 3))
      .toDF("om", "start", "end")
      .select(
        expr("transform(om, x -> struct(x._1 AS pos, x._2 AS page, x._3 AS l, x._4 AS t, x._5 AS r, x._6 AS b))").as("offset_map"),
        $"start", $"end")
    val rows = Anchors.attachBboxes(df).select("start", "bbox").collect()
      .map(r => r.getInt(0) -> Option(r.getAs[scala.collection.Seq[Int]](1)).map(_.toSeq))
      .toMap
    // span [0,5): chars 0,1,3,4 on page 0 → union (10,18,46,32)
    assert(rows(0).contains(Seq(10, 18, 46, 32)))
    // span [5,9): no mapped chars → null
    assert(rows(5).isEmpty)
    // span [2,3): only a page-1 char → null (reference skips page != 0)
    assert(rows(2).isEmpty)
  }

  test("F7 dataset slug") {
    assert(Misc.datasetSlug("org/name:v1 test") == "org__name__v1_test")
    assert(Misc.datasetSlug("") == "unknown")
    assert(Misc.datasetSlug("  ") == "unknown")
  }
}
