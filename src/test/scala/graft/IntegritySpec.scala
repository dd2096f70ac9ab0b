package graft

import graft.pipeline.{Deid, DeidCore, TurnsGen}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports of the reference's e2e integrity gates:
  *  - content-integrity floor: len(output) >= 0.8 * len(input)
  *    (`tests/end_to_end_test.py:63-67`), on non-HTML rows (extraction
  *    legitimately shrinks HTML documents);
  *  - format-preserving replacement: a redacted medical-record id still
  *    matches `[A-Z][0-9]{7,8}` (`tests/pii_test_suite.py:54-87`);
  *  - PII absence: originals never survive in replace-mode output
  *    (`tests/test_replacer.py:9`).
  */
class IntegritySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("content-integrity floor on the whole corpus (non-HTML rows)") {
    val t = TurnsGen.turns(spark, "/root/testdata/sf0.001")
      .where(not(col("text").contains("<html")))
    val bad = Deid.redact(t)
      .join(t.select(col("conv_id"), col("turn_idx"),
        length(col("text")).as("len_in")), Seq("conv_id", "turn_idx"))
      .where(length(col("text")).cast("double") < col("len_in") * 0.8)
      .count()
    assert(bad == 0)
  }

  test("format-preserving replacements: redacted values match their type formats") {
    val r = DeidCore.process("病歷號: M1234567, ID A123456789, 電話 0912345678")
    r.replacementMap.foreach { case (key, value) =>
      if (key.startsWith("MEDICAL_ID:")) assert(value.matches("[A-Z][0-9]{7,8}"), key)
      if (key.startsWith("ID:")) assert(value.matches("[A-Z][12][0-9]{8}"), key)
      if (key.startsWith("PHONE:")) assert(value.matches("09[0-9]{8}"), key)
    }
    assert(r.replacementMap.nonEmpty)
  }

  test("originals are absent from replace-mode output across the corpus") {
    // exception faithful to the reference: its fallback ADDRESS/NAME lists
    // contain the corpus values, so `rng.choice` can map a value to ITSELF
    // (fake_provider.py:147-166) — replacement == original is not a leak
    val t = TurnsGen.turns(spark, "/root/testdata/sf0.001").limit(600)
    val leaked = Deid.redact(t)
      .select(col("text"), explode(col("events")).as("ev"))
      .where(col("ev.original") =!= col("ev.replacement") &&
        col("text").contains(col("ev.original")))
      .count()
    assert(leaked == 0)
  }
}
