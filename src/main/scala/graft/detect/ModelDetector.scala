package graft.detect

import graft.detect.BioDecode.ScoredToken
import graft.model.SpanEnt
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** D3/D4 scaffold — the model-backed NER detector's *dataflow*, with the
  * model forward pass behind a pluggable [[TokenScorer]].
  *
  * Mirrors the reference's structure exactly
  * (`bert_detector.py:53-160`, `bert_onnx_detector.py:54-174`):
  * sliding-window chunking (stride = maxLen/2) → per-chunk token scoring →
  * BIO decode with offset shift → overlapping-entity merge. The scorer is
  * where ONNX Runtime Java would sit (session per executor via
  * `@transient lazy val`, one batched `run` per partition — the reference
  * batches all chunks in one `session.run`, `bert_onnx_detector.py:77-81`);
  * this environment ships no model runtime, so tests plug a deterministic
  * fake. Everything around the scorer is real and unit-tested.
  */
object ModelDetector {

  /** Scores one batch of text chunks into labeled tokens. Implementations
    * must be Serializable; heavyweight state (a session) belongs in a
    * `@transient lazy val` so each executor builds it once.
    */
  trait TokenScorer extends Serializable {
    def score(chunks: Seq[String]): Seq[Seq[ScoredToken]]
  }

  /** `BERT_CONFIDENCE_THRESHOLD` (`config.py:101`) — P10. */
  val defaultConfidenceThreshold = 0.85

  /** Detect over one text: chunk → score → decode(+shift) → threshold →
    * merge. Pure given the scorer.
    */
  def detect(
      text: String,
      scorer: TokenScorer,
      maxLen: Int = 512,
      confidenceThreshold: Double = defaultConfidenceThreshold,
      source: String = "bert"
  ): List[SpanEnt] = {
    val starts = BioDecode.chunkStarts(text.codePointCount(0, text.length), maxLen)
    val chunks = starts.map { s =>
      graft.redact.Redactor.cpSlice(text, s, s + maxLen)
    }
    val scored = scorer.score(chunks)
    val entities = starts.zip(scored).flatMap { case (offset, toks) =>
      // P10: a sub-threshold (or "O") token CLOSES the current entity inside
      // the decode loop (`bert_onnx_detector.py:105-109`) — it is handled
      // in-loop, not pre-filtered, so an I- token after a low-confidence gap
      // starts fresh instead of extending across it.
      BioDecode.decode(toks, offset, source, confidenceThreshold)
    }
    BioDecode.mergeEntities(entities)
  }

  /** Distributed form: one scorer instance per executor, texts scored in
    * partition-sized batches (the Spark analogue of the reference's one
    * batched `session.run`).
    */
  def detectColumn(
      df: DataFrame,
      textCol: String,
      scorer: TokenScorer,
      maxLen: Int = 512
  )(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val schema = df.schema
    val idx = schema.fieldIndex(textCol)
    val ds: Dataset[(String, List[SpanEnt])] = df
      .select(col(textCol))
      .as[String]
      .mapPartitions { it =>
        it.map(t => (t, detect(t, scorer, maxLen)))
      }
    ds.toDF(textCol, "model_entities")
  }

  /** Chunk + decode around ONE `scorer.score` call for a whole batch of
    * texts — the reference feeds every chunk of the document to a single
    * batched `session.run` (`bert_onnx_detector.py:77-81`); at table scale
    * the batch is `batchSize` rows' chunks, amortizing session overhead.
    * Identical results to per-text scoring (chunks are scored
    * independently) — spec-pinned.
    */
  def detectBatch(
      texts: Seq[String],
      scorer: TokenScorer,
      maxLen: Int = 512,
      confidenceThreshold: Double = defaultConfidenceThreshold,
      source: String = "bert"
  ): Seq[List[SpanEnt]] = {
    val perText = texts.map { t =>
      val starts = BioDecode.chunkStarts(t.codePointCount(0, t.length), maxLen)
      starts -> starts.map(s => graft.redact.Redactor.cpSlice(t, s, s + maxLen))
    }
    val scored = scorer.score(perText.flatMap(_._2))
    var cursor = 0
    perText.map { case (starts, chunks) =>
      val mine = scored.slice(cursor, cursor + chunks.length)
      cursor += chunks.length
      BioDecode.mergeEntities(starts.zip(mine).flatMap { case (offset, toks) =>
        BioDecode.decode(toks, offset, source, confidenceThreshold)
      })
    }
  }

  /** Keyed distributed form over a turns table — carries (conv_id, turn_idx)
    * through the batched scorer so downstream queries can join / order (the
    * driver-contract surface for the D3/D4 scaffold).
    */
  def detectTurns(
      df: DataFrame,
      scorer: TokenScorer,
      maxLen: Int = 512,
      batchSize: Int = 64
  )(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col("conv_id"), col("turn_idx"), col("text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.map(b => (b._1, b._2))
            .zip(detectBatch(batch.map(_._3), scorer, maxLen))
            .map { case ((c, i), ents) => (c, i, ents) }
        }
      }
      .toDF("conv_id", "turn_idx", "model_entities")
  }

  /** Deterministic stand-in for the ONNX session (this environment ships no
    * model runtime — SURVEY §7.6): labels whole `\S+` tokens with B- tags by
    * simple lexical rules, confidence 0.95. Exercises the REAL dataflow
    * (chunking → batch scoring → threshold-aware BIO decode → merge,
    * `bert_onnx_detector.py:54-174`) end-to-end with SQL-expressible
    * semantics, so the driver's DuckDB oracle can gate the scaffold.
    */
  object HeuristicScorer extends TokenScorer {
    @transient private lazy val tokenPat = java.util.regex.Pattern.compile("\\S+")
    @transient private lazy val phonePat =
      java.util.regex.Pattern.compile("^09\\d{8}[.,!?]?$")
    @transient private lazy val idPat =
      java.util.regex.Pattern.compile("^[A-Z]\\d{9}[.,!?]?$")

    def score(chunks: Seq[String]): Seq[Seq[ScoredToken]] =
      chunks.map { chunk =>
        val m = tokenPat.matcher(chunk)
        val out = Seq.newBuilder[ScoredToken]
        while (m.find()) {
          val tok = m.group()
          val label =
            if (tok.contains("@")) "B-EMAIL"
            else if (phonePat.matcher(tok).matches()) "B-PHONE"
            else if (idPat.matcher(tok).matches()) "B-ID"
            else "O"
          out += ScoredToken(m.start, m.end, label, 0.95)
        }
        out.result()
      }
  }
}

/** F3 + the ONNX logits→token bridge (`bert_onnx_detector.py:17-20,83-137`):
  * numerically-stable softmax per token, argmax label, max-prob confidence.
  * This is the exact shape ONNX Runtime Java's output tensor feeds.
  */
object Logits {

  /** `_softmax` (`bert_onnx_detector.py:17-20`): stable exp-normalize. */
  def softmax(xs: Array[Double]): Array[Double] = {
    var max = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) { if (xs(i) > max) max = xs(i); i += 1 }
    val out = new Array[Double](xs.length)
    var sum = 0.0
    i = 0
    while (i < xs.length) { out(i) = math.exp(xs(i) - max); sum += out(i); i += 1 }
    i = 0
    while (i < xs.length) { out(i) /= sum; i += 1 }
    out
  }

  /** One chunk's logits → scored tokens: per token argmax(softmax(logits))
    * with its probability as confidence; offsets/special flags provided by
    * the tokenizer side.
    */
  def toScoredTokens(
      logits: Array[Array[Double]],
      offsets: Array[(Int, Int)],
      special: Array[Boolean],
      id2label: Int => String
  ): Seq[BioDecode.ScoredToken] =
    logits.indices.map { i =>
      val probs = softmax(logits(i))
      var best = 0
      var j = 1
      while (j < probs.length) { if (probs(j) > probs(best)) best = j; j += 1 }
      BioDecode.ScoredToken(offsets(i)._1, offsets(i)._2, id2label(best),
        probs(best), special(i))
    }
}
