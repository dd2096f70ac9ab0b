package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

/** Byte-level BPE tokenizer (the GPT-2 algorithm, Radford et al. 2019 —
  * public: byte→unicode remapping + regex pre-tokenization + greedy
  * lowest-rank pair merging). Training-data pipelines budget and bucket by
  * REAL token counts; the whitespace/regex counters in [[TextStats]] are
  * heuristics, this is the exact count for any GPT-2-family vocabulary.
  *
  * The vocab/merges FILES are inputs (e.g. the public GPT-2 artifacts the
  * reference repo carries under `models/gpt2/onnx/`) — nothing is baked in.
  * At scale: load once on the driver, broadcast, `mapPartitions` — see
  * [[BpeTokenizer.countTokens]].
  *
  * Verified by (a) encode→decode identity on arbitrary unicode text and
  * (b) the publicly documented GPT-2 ids for canonical strings
  * ("Hello world" → [15496, 995]).
  */
final class BpeTokenizer(
    vocab: Map[String, Int],
    merges: Map[(String, String), Int]) extends Serializable {

  private val inverseVocab: Map[Int, String] = vocab.map(_.swap)

  /** GPT-2 pre-tokenization pattern (tokenizer.json / encoder.py). */
  @transient private lazy val pat: Pattern = Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    Pattern.UNICODE_CHARACTER_CLASS)

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()

  def encode(text: String): Array[Int] = {
    val out = Array.newBuilder[Int]
    val m = pat.matcher(text)
    while (m.find()) {
      val piece = m.group()
      val cached = cache.get(piece)
      if (cached != null) out ++= cached
      else {
        // fail fast on a vocab/merges mismatch: count() is advertised as
        // exact, so silently dropping an unmapped merged piece would make
        // token budgets wrong with no signal
        val ids = bpe(BpeTokenizer.toByteUnicode(piece)).map { p =>
          vocab.getOrElse(p, throw new IllegalStateException(
            s"BPE piece '$p' is absent from the vocab — vocab.json and " +
              "merges.txt are mismatched artifacts"))
        }.toArray
        if (cache.size() < 50000) cache.put(piece, ids)
        out ++= ids
      }
    }
    out.result()
  }

  def count(text: String): Int = encode(text).length

  def decode(ids: Seq[Int]): String =
    BpeTokenizer.fromByteUnicode(ids.map { id =>
      inverseVocab.getOrElse(id, throw new IllegalStateException(
        s"token id $id is not in the vocab (size ${vocab.size})"))
    }.mkString)

  /** Greedy BPE: repeatedly merge the lowest-rank adjacent pair. */
  private def bpe(word: String): Seq[String] = {
    var parts = word.map(_.toString).toBuffer
    if (parts.length <= 1) return parts.toSeq
    var done = false
    while (!done && parts.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < parts.length - 1) {
        val r = merges.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
      else {
        parts(bestIdx) = parts(bestIdx) + parts(bestIdx + 1)
        parts.remove(bestIdx + 1)
      }
    }
    parts.toSeq
  }
}

object BpeTokenizer {

  /** GPT-2 `bytes_to_unicode`: printable latin-1 bytes map to themselves,
    * the rest shift into the U+0100+ range so every byte is a visible char.
    */
  private val byteToChar: Array[Char] = {
    val direct = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (direct.contains(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }
  private val charToByte: Map[Char, Byte] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  def toByteUnicode(s: String): String =
    s.getBytes(StandardCharsets.UTF_8).map(b => byteToChar(b & 0xff)).mkString

  def fromByteUnicode(s: String): String =
    new String(s.flatMap(charToByte.get).toArray, StandardCharsets.UTF_8)

  /** Load from vocab.json + merges.txt (the public artifact pair). */
  def load(vocabPath: String, mergesPath: String): BpeTokenizer = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(vocabPath))
    val vocab = Map.newBuilder[String, Int]
    root.properties().forEach(e => vocab += e.getKey -> e.getValue.asInt())
    val merges = Map.newBuilder[(String, String), Int]
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(mergesPath), StandardCharsets.UTF_8)
    var rank = 0
    lines.forEach { line =>
      if (line.nonEmpty && !line.startsWith("#")) {
        val sp = line.indexOf(' ')
        if (sp > 0) {
          merges += (line.substring(0, sp), line.substring(sp + 1)) -> rank
          rank += 1
        }
      }
    }
    new BpeTokenizer(vocab.result(), merges.result())
  }

  /** Distributed token counting: tokenizer broadcast once, one narrow
    * mapPartitions — the per-document budget column for mixture planning.
    */
  def countTokens(
      spark: SparkSession,
      df: DataFrame,
      tokenizer: BpeTokenizer,
      textCol: String = "text",
      outCol: String = "n_bpe_tokens"): DataFrame = {
    val bc = spark.sparkContext.broadcast(tokenizer)
    val f = org.apache.spark.sql.functions.udf((t: String) =>
      if (t == null) 0 else bc.value.count(t))
    df.withColumn(outCol, f(org.apache.spark.sql.functions.col(textCol)))
  }
}
