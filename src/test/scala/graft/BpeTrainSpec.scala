package graft

import graft.ops.BpeTrain
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training (ops/BpeTrain.scala): hand-verified merges on the
  * Sennrich 2016 example, deterministic tie-breaks, the stop-below-2
  * criterion, pairCounts == the loop's first iteration, application by
  * learned order, the segmentation-table roundtrip, and the maxWords
  * driver-bounded-collect guard.
  */
class BpeTrainSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // the paper's §3.2 worked vocabulary
  private val sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnMerges: Sennrich example learns es, est, est</w> first") {
    val merges = BpeTrain.learnMerges(sennrich, nMerges = 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (l,o)=7, (o,w)=7…
    // ties break lexicographically: (e,s) < (s,t) < (t,</w>)
    assert(merges.take(3) === Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    // round 4: (l,o)=7 and (o,w)=7 tie -> (l,o)
    assert(merges(3) === ("l", "o"))
  }

  test("learnMerges: stops when no pair reaches count 2; empty input") {
    val merges = BpeTrain.learnMerges(Seq(("ab", 1L)), nMerges = 10)
    assert(merges === Seq.empty) // best pair occurs once -> stop immediately
    assert(BpeTrain.learnMerges(Seq.empty, 5) === Seq.empty)
    intercept[IllegalArgumentException](BpeTrain.learnMerges(sennrich, -1))
  }

  test("pairCounts equals the loop's first-iteration counts") {
    val wc = sennrich.toDF("word", "cnt")
    val out = BpeTrain.pairCounts(wc).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out(("e", "s")) === 9L)
    assert(out(("s", "t")) === 9L)
    assert(out(("t", "</w>")) === 9L)
    assert(out(("l", "o")) === 7L)
    assert(out(("w", "</w>")) === 5L) // low(5) only
    assert(out(("w", "e")) === 8L)    // lower(2) + newest(6)
    // total pair mass = Σ cnt·(len(word)) (chars+</w> gives len pairs)
    val total = out.values.sum
    assert(total === sennrich.map { case (w, c) => c * w.length }.sum)
  }

  test("applyMerges: learned-order application segments seen and unseen words") {
    val merges = BpeTrain.learnMerges(sennrich, nMerges = 6)
    assert(BpeTrain.applyMerges("newest", merges).contains("est</w>") ||
      BpeTrain.applyMerges("newest", merges).last.endsWith("</w>"))
    // 'lowest' is UNSEEN but composed of learned units
    val segs = BpeTrain.applyMerges("lowest", merges)
    assert(segs.mkString("|").startsWith("lo"))
    assert(segs.last.endsWith("</w>"))
    // no merges -> raw symbolization
    assert(BpeTrain.applyMerges("ab", Seq.empty) === Vector("a", "b", "</w>"))
  }

  test("train end-to-end: distributed counts reproduce the driver loop; maxWords guard") {
    val df = sennrich.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .map(Tuple1(_)).toDF("text")
    val merges = BpeTrain.train(df, nMerges = 3)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
    val e = intercept[IllegalArgumentException](
      BpeTrain.train(df, nMerges = 1, maxWords = 2))
    assert(e.getMessage.contains("maxWords"))
  }

  test("vocabDelta: delta words flagged against history; empty history -> all new") {
    val hist = Seq("low", "newest").map(Tuple1(_)).toDF("word")
    val delta = Seq((1L, "low lower NEWEST"), (2L, "low")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.vocabDelta(hist, delta)
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === Seq(("low", 2L, false), ("lower", 1L, true),
      ("newest", 1L, false))) // lowercased before the join
    val allNew = graft.ops.TextStats.vocabDelta(
      spark.emptyDataFrame.select(lit("x").as("word")).limit(0), delta)
    assert(allNew.where(!col("is_new")).count() === 0)
  }

  test("segmentTable: bounded-vocab segmentation with piece counts") {
    val merges = BpeTrain.learnMerges(sennrich, nMerges = 5)
    val t = BpeTrain.segmentTable(sennrich.toDF("word", "cnt"), merges)
      .orderBy("word").collect()
    t.foreach { r =>
      val pieces = r.getSeq[String](2)
      assert(pieces.mkString === r.getString(0) + "</w>") // lossless
      assert(r.getInt(3) === pieces.length)
    }
  }
}
