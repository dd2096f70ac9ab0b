package graft

import graft.ops.WebClean
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WebCleanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def c4(rows: (Long, String)*) =
    WebClean.c4Signals(rows.toDF("doc_id", "text"), badWords = Seq("badword"))
      .withColumn("keep", WebClean.c4Keep(minSentences = 3))

  test("c4: every line rule bites independently") {
    val page = Seq(
      "this line has five good words.",   // kept
      "too short line.",                  // dropped: < 5 words
      "this line has no terminal punctuation at all", // dropped: no mark
      "please enable javascript to see this page.",   // dropped: javascript
      "read our privacy policy for more details today.", // dropped: policy
      "  padded line still counts its five words.  ", // kept (trimmed first)
      "is this a real question here?"     // kept: '?' terminal
    ).mkString("\n")
    val r = c4((1L, page)).collect()(0)
    assert(r.getAs[Int]("n_lines") == 7)
    assert(r.getAs[Int]("n_kept_lines") == 3)
    assert(r.getAs[String]("cleaned_text") ==
      "this line has five good words.\npadded line still counts its five words.\nis this a real question here?")
    assert(r.getAs[Int]("n_sentences") == 3)
    assert(r.getAs[Boolean]("keep"))
  }

  test("c4: page gates — lorem ipsum, brace, bad word, and the exact 3-sentence boundary") {
    val good = "one good line with five words.\nanother good line with five words!\na third good line with words?"
    val rows = c4(
      (1L, good),                                            // 3 sentences → keep
      (2L, good + "\nsee the Lorem Ipsum sample here now."), // lorem gate
      (3L, good + "\ncode { x } is not prose here."),        // brace gate
      (4L, good + "\nthis page contains badword in text."),  // bad-word gate
      (5L, "only two sentences on this page.\nsecond one is also pretty fine!") // < 3 sentences
    ).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("keep"))
    assert(rows(2L).getAs[Boolean]("has_lorem") && !rows(2L).getAs[Boolean]("keep"))
    assert(rows(3L).getAs[Boolean]("has_brace") && !rows(3L).getAs[Boolean]("keep"))
    assert(rows(4L).getAs[Boolean]("has_bad_word") && !rows(4L).getAs[Boolean]("keep"))
    assert(rows(5L).getAs[Int]("n_sentences") == 2 && !rows(5L).getAs[Boolean]("keep"))
  }

  test("c4: bad-word match is word-boundary, not substring") {
    val page = "the word badwordish is not badword at all here.\nthree more sentences needed right now.\nand another one right here now.\nplus a third filler sentence too."
    val r = c4((1L, page)).collect()(0)
    // 'badwordish' alone must NOT trip the gate...
    val r2 = c4((2L, page.replace(" badword ", " cleanword "))).collect()(0)
    assert(!r2.getAs[Boolean]("has_bad_word"))
    // ...but the standalone word does
    assert(r.getAs[Boolean]("has_bad_word"))
  }

  test("hashed linear score: exact fold, empty-doc guard, bucket-cap guard") {
    val df = WebClean.hashedLinearScore(Seq((1L, "Alpha beta alpha"), (2L, "   ")).toDF("doc_id", "text"))
    val byId = df.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // replay the engine's arithmetic on the driver for one doc
    def weight(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(hex.substring(0, 6), 16) % (1L << 20)
      (bucket * 2654435761L) % 2001L - 1000L
    }
    val expected = weight("alpha") * 2 + weight("beta") // lowercased tokens
    val r1 = byId(1L)
    assert(r1.getAs[Long]("score_sum") == expected)
    assert(r1.getAs[Double]("score") == expected.toDouble / 3.0)
    val r2 = byId(2L) // whitespace-only doc: zero tokens, score 0, not kept
    assert(r2.getAs[Int]("n_tokens") == 0 && r2.getAs[Long]("score_sum") == 0L
      && r2.getAs[Double]("score") == 0.0 && !r2.getAs[Boolean]("keep"))
    intercept[IllegalArgumentException] {
      WebClean.hashedLinearScore(Seq((1L, "x")).toDF("doc_id", "text"), buckets = (1 << 24) + 1)
    }
  }

  test("sentence-span dedup: first occurrence owns, overlap cuts are a set, unique docs untouched") {
    val a = "s one one. s two two. s three three. s four four."
    val b = a // exact copy: every span duplicated → cleaned empty
    val c = "s one one. s two two. s three three. s five five." // shares span[0] only
    val d = "totally distinct. nothing shared here. third unique sentence. final one."
    val out = WebClean.sentenceSpanDedup(
        Seq((1L, a), (2L, b), (3L, c), (4L, d), (5L, "")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // owner doc is untouched
    assert(out(1L).getAs[Int]("n_cut_sentences") == 0)
    assert(out(1L).getAs[String]("cleaned_text") ==
      "s one one. s two two. s three three. s four four.")
    // exact copy loses all 4 (spans [0] and [1] overlap — cut set, no double count)
    assert(out(2L).getAs[Int]("n_cut_sentences") == 4)
    assert(out(2L).getAs[String]("cleaned_text") == "")
    // partial copy loses sentences 0-2, keeps its distinct 4th
    assert(out(3L).getAs[Int]("n_cut_sentences") == 3)
    assert(out(3L).getAs[String]("cleaned_text") == "s five five.")
    // unique doc untouched
    assert(out(4L).getAs[Int]("n_cut_sentences") == 0)
    // no-sentence doc: zero counts, empty rebuild
    assert(out(5L).getAs[Int]("n_sentences") == 0
      && out(5L).getAs[Int]("n_cut_sentences") == 0
      && out(5L).getAs[String]("cleaned_text") == "")
    intercept[IllegalArgumentException] {
      WebClean.sentenceSpanDedup(Seq((1L, "x.")).toDF("doc_id", "text"), spanLen = 0)
    }
  }

  test("WebClean ops tolerate null, empty and pathological text (no NPE, pages dropped not kept)") {
    val df = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, " \t"),                       // whitespace-zoo only
      (4L, "a{.\n!?.."),                       // marks/brace soup
      (5L, "𠀀 one two three four.") // supplementary-plane lead
    ).toDF("doc_id", "text")
    val c4 = WebClean.c4Signals(df, badWords = Seq("vector"))
      .withColumn("keep", WebClean.c4Keep()).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // null text: null signals propagate, keep is never TRUE (three-valued
    // AND) — a null page is dropped by where(keep), not kept or crashed
    assert(c4(1L).getAs[Any]("keep") != true)
    assert(!c4(2L).getAs[Boolean]("keep") && !c4(3L).getAs[Boolean]("keep"))
    assert(c4(4L).getAs[Boolean]("has_brace"))
    val hq = WebClean.hashedLinearScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(hq(2L).getAs[Int]("n_tokens") == 0)
    // pinned tokenizer semantics: trim strips SPACES only, split keeps
    // empty tokens (Java limit -1) — " \t" is two empty tokens, and the
    // DuckDB oracle (space-only trim, regexp_split_to_array) agrees
    assert(hq(3L).getAs[Int]("n_tokens") == 2)
    assert(hq(1L).getAs[Any]("keep") != true)
    assert(hq(5L).getAs[Int]("n_tokens") == 5)
    val sd = WebClean.sentenceSpanDedup(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(sd.size == 5) // one row per input, nulls included
    assert(sd(2L).getAs[Int]("n_sentences") == 0
      && sd(2L).getAs[String]("cleaned_text") == "")
    assert(sd(4L).getAs[Int]("n_cut_sentences") == 0)
  }

  test("sentence-span dedup is idempotent on its own output") {
    val a = "s one one. s two two. s three three. s four four."
    val c = "s one one. s two two. s three three. s five five."
    val first = WebClean.sentenceSpanDedup(
        Seq((1L, a), (2L, a), (3L, c)).toDF("doc_id", "text"))
      .select(col("doc_id"), col("cleaned_text").as("text"))
    val second = WebClean.sentenceSpanDedup(first)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // nothing left to cut: pass 2 is the identity on every doc
    assert(second.values.forall(_.getAs[Int]("n_cut_sentences") == 0))
  }
}
