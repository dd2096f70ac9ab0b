package graft

import graft.ops.Drift
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** χ² corpus-drift monitor (ops/Drift.scala): hand-computed contingency
  * values, the zero-drift identity, missing-bucket zero fill, and the
  * empty-snapshot / exactness guards.
  */
class DriftSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("chiSquareDrift: hand-computed 2x2 contingency value") {
    // histograms: s1 = {b0: 30, b1: 10} (N1=40), s2 = {b0: 10, b1: 30} (N2=40)
    // D_b0 = 30·40 − 10·40 = 800; term_b0 = 800² / (40·40·40) = 10.0
    // by symmetry term_b1 = 10.0 → chi2 = 20.0 (the classic 2x2 formula
    // N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) = 80·(900−100)²·... = 20 agrees)
    val h1 = Seq((0L, 30L), (1L, 10L)).toDF("bucket", "cnt")
    val h2 = Seq((0L, 10L), (1L, 30L)).toDF("bucket", "cnt")
    val per = Drift.chiSquareDrift(h1, h2).orderBy("bucket").collect()
    assert(per.map(_.getDouble(3)).toSeq === Seq(10.0, 10.0))
    val tot = Drift.chiSquareTotal(Drift.chiSquareDrift(h1, h2)).collect()(0)
    assert(tot.getDouble(0) === 20.0 && tot.getLong(1) === 1L)
  }

  test("zero drift on identical histograms; missing buckets fill as zero") {
    val h = Seq((0L, 5L), (1L, 7L), (2L, 1L)).toDF("bucket", "cnt")
    val tot = Drift.chiSquareTotal(Drift.chiSquareDrift(h, h)).collect()(0)
    assert(tot.getDouble(0) === 0.0 && tot.getLong(1) === 2L)
    // a bucket absent from one side contributes with o=0, not a dropped row
    val h2 = Seq((0L, 5L), (3L, 8L)).toDF("bucket", "cnt")
    val per = Drift.chiSquareDrift(h, h2).orderBy("bucket").collect()
    assert(per.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(per(3).getLong(1) === 0L && per(3).getLong(2) === 8L)
    assert(per(1).getLong(2) === 0L)
  }

  test("guards: empty snapshot refused; exactness domain fails loudly") {
    val h = Seq((0L, 5L)).toDF("bucket", "cnt")
    val empty = Seq.empty[(Long, Long)].toDF("bucket", "cnt")
    val e1 = intercept[Exception](Drift.chiSquareDrift(h, empty).collect())
    assert((e1.getMessage + Option(e1.getCause).map(_.getMessage).getOrElse(""))
      .contains("empty snapshot"))
    val e2 = intercept[Exception](
      Drift.chiSquareDrift(h, h, safeBound = 1.0).collect())
    assert((e2.getMessage + Option(e2.getCause).map(_.getMessage).getOrElse(""))
      .contains("exactness domain"))
  }
}
