package graft

import graft.detect.BioDecode.ScoredToken
import graft.detect.ModelDetector
import graft.model.SpanEnt
import org.scalatest.funsuite.AnyFunSuite

class ModelDetectorSpec extends AnyFunSuite {

  /** Deterministic fake scorer: labels every occurrence of "Alice" as
    * B-PER and "Chen" as I-PER, whitespace tokens otherwise O. Stands in
    * for an ONNX session; exercises chunking/decode/merge for real.
    */
  private object FakeScorer extends ModelDetector.TokenScorer {
    def score(chunks: Seq[String]): Seq[Seq[ScoredToken]] =
      chunks.map { chunk =>
        val m = java.util.regex.Pattern.compile("\\S+").matcher(chunk)
        val out = Seq.newBuilder[ScoredToken]
        while (m.find()) {
          val label = m.group() match {
            case "Alice" => "B-PER"
            case "Chen" => "I-PER"
            case "Bob" => "B-PER"
            case "weak" => "B-ORG" // below threshold
            case _ => "O"
          }
          val score = if (m.group() == "weak") 0.4 else 0.99
          out += ScoredToken(m.start, m.end, label, score)
        }
        out.result()
      }
  }

  test("chunk → score → decode → merge over a windowed text") {
    val text = "hi Alice Chen and Bob and weak signal"
    val ents = ModelDetector.detect(text, FakeScorer, maxLen = 512)
    assert(ents == List(
      SpanEnt(3, 13, "NAME", 0.99, "bert"), // Alice Chen merged B+I
      SpanEnt(18, 21, "NAME", 0.99, "bert")))
    // 'weak' dropped by the 0.85 confidence threshold (P10)
    assert(!ents.exists(_.typ == "ORGANIZATION"))
  }

  test("sub-threshold token INSIDE an entity closes it (in-loop, not filtered)") {
    // B-NAME(0.9) I-NAME(0.5) I-NAME(0.9): the reference's decode closes the
    // entity at the low-confidence gap (bert_onnx_detector.py:105-109) — a
    // pre-filter would wrongly yield one long span across the gap.
    val toks = Seq(
      ScoredToken(0, 5, "B-PER", 0.9),
      ScoredToken(6, 10, "I-PER", 0.5),
      ScoredToken(11, 15, "I-PER", 0.9))
    val ents = graft.detect.BioDecode.decode(toks, threshold = 0.85)
    assert(ents == List(SpanEnt(0, 5, "NAME", 0.9, "bert")),
      s"gap must close the entity; trailing I- without a B- is dropped: $ents")
  }

  test("windowing: entities found in overlapping chunks are merged once") {
    // text longer than maxLen so Alice appears in two overlapping windows
    val filler = "x " * 40
    val text = filler + "Alice Chen" + " y" * 30
    val ents = ModelDetector.detect(text, FakeScorer, maxLen = 100)
    val names = ents.filter(_.typ == "NAME")
    assert(names.length == 1, s"expected single merged entity, got $names")
    assert(graft.redact.Redactor.cpSlice(text, names.head.start, names.head.end)
      == "Alice Chen")
  }

  test("batched scoring (one score call per batch) equals per-text detection") {
    val texts = Seq(
      "hi Alice Chen and Bob",
      "x " * 60 + "Alice Chen" + " y" * 20, // multi-chunk at maxLen=100
      "", "weak signal only", "Bob")
    val single = texts.map(t => ModelDetector.detect(t, FakeScorer, maxLen = 100))
    val batched = ModelDetector.detectBatch(texts, FakeScorer, maxLen = 100)
    assert(batched == single)
  }

  test("distributed scoring via mapPartitions") {
    implicit val spark: org.apache.spark.sql.SparkSession = SparkTestBase.spark
    import spark.implicits._
    val df = Seq("Alice Chen here", "nothing", "Bob alone").toDF("text")
    val out = ModelDetector.detectColumn(df, "text", FakeScorer)
      .selectExpr("text", "size(model_entities) AS n")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out("Alice Chen here") == 1)
    assert(out("nothing") == 0)
    assert(out("Bob alone") == 1)
  }

  test("model entities compose with the composite resolver (D9 policy)") {
    val text = "Alice Chen id A123456789"
    val model = ModelDetector.detect(text, FakeScorer)
    val regex = graft.detect.Detectors.regexDetect(text, "zh")
    val resolved = graft.detect.Resolver.resolve((model ++ regex).toArray)
    assert(resolved.exists(_.typ == "NAME"))
    assert(resolved.exists(_.typ == "ID"))
  }
}
