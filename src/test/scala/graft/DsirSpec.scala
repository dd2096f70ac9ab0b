package graft

import graft.ops.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance weighting (ops/Dsir.scala): feature construction,
  * hand-computed exact rational scores on a collision-free bucket space,
  * the paper's log-space variant vs a driver replay, marker separability,
  * the no-feature-doc absence contract, and the exactness-domain guard.
  */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("featureArray: unigrams + adjacent bigrams, edge shapes") {
    val out = Seq("a b c", "solo", "  ", null.asInstanceOf[String])
      .map(Tuple1(_)).toDF("t")
      .select(Dsir.featureArray(col("t")).as("f")).collect()
      .map(_.getSeq[String](0))
    assert(out(0) === Seq("a", "b", "c", "a b", "b c"))
    assert(out(1) === Seq("solo"))
    assert(out(2) === Seq.empty)
    assert(out(3) === Seq.empty)
  }

  test("importanceScores: hand-computed exact rationals (nBuckets big enough for no collisions)") {
    // corpus doc 1 = "x x" (features: x, x, "x x" -> f(bx)=2, f(bxx)=1)
    // corpus doc 2 = "y"   (feature: y)
    // target       = "x"   (feature: x)
    // nBuckets = B; raw_total = 4, tgt_total = 1
    // r(x)  = (1+1)(4+B) / ((2+1)(1+B));  r(xx) = (0+1)(4+B)/((1+1)(1+B))
    // r(y)  = (0+1)(4+B) / ((1+1)(1+B))
    val corpus = Seq((1L, "x x"), (2L, "y")).toDF("doc_id", "text")
    val target = Seq(Tuple1("x")).toDF("text")
    val b = 4096
    val out = Dsir.importanceScores(corpus, target, nBuckets = b)
      .orderBy("doc_id").collect()
    val rT = (4.0 + b) / (1.0 + b)
    // doc 1: (2 * 2*(4+B)/(3*(1+B)) + 1*(4+B)/(2*(1+B))) / 3  — the engine
    // folds f INTO the numerator (one term per bucket), bucket order
    val bx = 2.0 * 2 * (4 + b) / (3.0 * (1 + b))
    val bxx = 1.0 * (4 + b) / (2.0 * (1 + b))
    assert(out(0).getLong(1) === 3L)
    assert(math.abs(out(0).getDouble(2) - (bx + bxx) / 3.0) < 1e-12)
    assert(out(1).getLong(1) === 1L)
    assert(math.abs(out(1).getDouble(2) - rT / 2.0) < 1e-12)
  }

  test("logSpace variant equals a driver-side Σ f·ln(r)/n replay") {
    val corpus = Seq((1L, "x x z"), (2L, "y w")).toDF("doc_id", "text")
    val target = Seq(Tuple1("x z")).toDF("text")
    val b = 1 << 14
    val ratio = Dsir.importanceScores(corpus, target, nBuckets = b)
      .orderBy("doc_id").collect()
    val logs = Dsir.importanceScores(corpus, target, nBuckets = b, logSpace = true)
      .orderBy("doc_id").collect()
    // replay: recover per-bucket (f, r) from the rational form is not
    // possible post-sum, so recompute from first principles per doc
    def feats(t: String): Seq[String] = {
      val toks = t.split("\\s+").filter(_.nonEmpty).toSeq
      toks ++ toks.zip(toks.drop(1)).map { case (a, c) => s"$a $c" }
    }
    val rawAll = Seq("x x z", "y w").flatMap(feats)
    val tgtAll = feats("x z")
    def bucket(f: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(f.getBytes("UTF-8"))
      val hex = d.take(3).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % b
    }
    val rawH = rawAll.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val tgtH = tgtAll.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    Seq("x x z", "y w").zipWithIndex.foreach { case (t, i) =>
      val fs = feats(t).groupBy(bucket).view.mapValues(_.size.toLong).toMap
      val n = fs.values.sum
      val expected = fs.map { case (bk, f) =>
        val r = (tgtH.getOrElse(bk, 0L) + 1.0) * (rawAll.size + b) /
          ((rawH.getOrElse(bk, 0L) + 1.0) * (tgtAll.size + b))
        f * math.log(r)
      }.sum / n
      assert(math.abs(logs(i).getDouble(2) - expected) < 1e-9, s"doc ${i + 1}")
      // and the ratio-form keep direction agrees on this separable input
      assert((logs(i).getDouble(2) > logs(1 - i).getDouble(2)) ===
        (ratio(i).getDouble(2) > ratio(1 - i).getDouble(2)))
    }
  }

  test("separability: marker-bearing docs outscore plain docs; no-feature docs absent") {
    val base = (0L until 60L).map(i => (i, s"tok${i % 7} tok${i % 11} tok${i % 13} filler common words"))
    val corpus = base.map { case (i, t) =>
      (i, if (i % 6 == 0) t + " premium curated marker" else t)
    } :+ ((999L, "   ")) // no features -> absent
    val target = base.filter(_._1 % 10 == 0).map { case (i, t) => (i, t + " premium curated marker") }
    val out = Dsir.importanceScores(corpus.toDF("doc_id", "text"),
      target.toDF("doc_id", "text"), nBuckets = 4096).cache()
    try {
      assert(out.where(col("doc_id") === 999L).count() === 0)
      val minMarked = out.where(col("doc_id") % 6 === 0)
        .agg(min("score")).collect()(0).getDouble(0)
      val maxPlain = out.where(col("doc_id") % 6 =!= 0)
        .agg(max("score")).collect()(0).getDouble(0)
      assert(minMarked > maxPlain,
        s"marked min $minMarked should beat plain max $maxPlain")
    } finally out.unpersist()
  }

  test("resampleByScore: rate = floor(1000·score/max), max doc always kept, deterministic") {
    val scored = Seq((1L, 10L, 2.0), (2L, 10L, 1.0), (3L, 10L, 0.5), (4L, 10L, 0.0))
      .toDF("doc_id", "n_features", "score")
    val out = graft.ops.Dsir.resampleByScore(scored,
        bucketOf = graft.ops.Sampling.mulHashBucket(_))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(3)).toSeq === Seq(1000L, 500L, 250L, 0L))
    assert(out(0).getBoolean(4))   // rate 1000 -> bucket < 1000 always
    assert(!out(3).getBoolean(4))  // rate 0 -> never kept
    // keep replays the bucket arithmetic exactly
    out.foreach { r =>
      val b = ((r.getLong(0) % 1048573L) * 2654435761L) % 1000L
      assert(r.getBoolean(4) === (b < r.getLong(3)))
    }
  }

  test("exactness-domain guard fires loudly, naming the fix") {
    val corpus = Seq((1L, "a b")).toDF("doc_id", "text")
    val target = Seq(Tuple1("a")).toDF("text")
    val e = intercept[Exception] {
      Dsir.importanceScores(corpus, target, nBuckets = 64, safeBound = 1.0)
        .collect()
    }
    assert(e.getMessage.contains("exactness domain") ||
      (e.getCause != null && e.getCause.getMessage.contains("exactness domain")))
    intercept[IllegalArgumentException](
      Dsir.importanceScores(corpus, target, nBuckets = 0))
  }
}
