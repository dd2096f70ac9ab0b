package graft.metrics

import graft.functions.SeqMatcher
import graft.training.{Canonical, PiiMarkup}
import graft.training.PiiMarkup.PiiBlock

import java.util.regex.Pattern

/** The complete per-example deid evaluation (G3–G8), cloned from
  * `/root/reference/src/deid_pipeline/training/deid_eval.py:122-337` —
  * `detect_pii_blocks`, `evaluate_prediction`, `aggregate_reports`.
  * Pure per-row functions; the Spark job joins examples↔predictions
  * ([[graft.sources.Sources.joinEvalPairs]]) and maps this over rows.
  */
object DeidEval {

  final case class ExampleReport(
      exampleId: String,
      piiRemovalRecall: Double,
      piiTotal: Int,
      piiLeakCount: Int,
      nonPiiSimilarity: Double,
      overRewriteRate: Double,
      typeConsistency: Double,
      repetition3gramRate: Double,
      formatCompliant: Boolean
  )

  /** `detect_pii_blocks` (`deid_eval.py:209-240`): markup first, else
    * weak-label spans.
    */
  def detectPiiBlocks(
      inputText: String,
      regexSpans: Seq[(Int, Int, String)] = Nil,
      preferMarkup: Boolean = true
  ): List[PiiBlock] = {
    if (preferMarkup) {
      val blocks = PiiMarkup.extractPiiBlocks(inputText)
      if (blocks.nonEmpty) return blocks
    }
    val raw = Option(inputText).getOrElse("")
    val cpLen = raw.codePointCount(0, raw.length)
    regexSpans.toList.flatMap { case (s, e, typ) =>
      if (s < 0 || e <= s || e > cpLen) None
      else Some(PiiBlock(typ, graft.redact.Redactor.cpSlice(raw, s, e), s, e, s, e))
    }
  }

  /** `compute_pii_removal_recall` (`deid_eval.py:122-137`). */
  def piiRemovalRecall(values: Seq[String], prediction: String): (Double, Int, Int) = {
    val pred = Option(prediction).getOrElse("")
    val total = values.length
    if (total == 0) return (1.0, 0, 0)
    val removed = values.count(v => v != null && v.nonEmpty && !pred.contains(v))
    (removed.toDouble / total, removed, total)
  }

  /** `compute_type_consistency` (`deid_eval.py:146-177`): canonical expected
    * counts vs regex found counts, macro-avg of min(1, found/expected) over
    * types that have a TYPE_PATTERN.
    */
  def typeConsistency(blocks: Seq[PiiBlock], prediction: String): Double = {
    val expected = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    blocks.foreach { b =>
      val canon = Canonical.canonicalizeEntityType(b.piiType).getOrElse("PII")
      expected(canon) = expected.getOrElse(canon, 0) + 1
    }
    val scores = expected.toSeq.flatMap { case (typ, exp) =>
      Metrics.typePatterns.get(typ).flatMap { p =>
        if (exp <= 0) None
        else {
          val m = Pattern.compile(p).matcher(Option(prediction).getOrElse(""))
          var found = 0
          while (m.find()) found += 1
          Some(math.min(1.0, found.toDouble / exp))
        }
      }
    }
    if (scores.isEmpty) 1.0 else scores.sum / scores.length
  }

  /** `check_format_compliance` (`deid_eval.py:180-206`). */
  def formatCompliant(prediction: String, bannedPhrases: Seq[String] = Nil): Boolean = {
    // Python str.strip(): all Unicode whitespace, not just <= U+0020
    val text = Option(prediction).getOrElse("").replaceAll("(?U)^\\s+|\\s+$", "")
    if (text.isEmpty) return false
    val lowered = text.toLowerCase
    val separators = Seq("input:", "output:", "analysis:", "explanation:", "step", "reason:")
    if (separators.exists(lowered.contains)) return false
    if (lowered.contains("<pii") || lowered.contains("[/")) return false
    !bannedPhrases.map(_.trim).filter(_.nonEmpty).exists(p => lowered.contains(p.toLowerCase))
  }

  /** `repetition_3gram_rate` (`deid_eval.py:257-268`). */
  def repetition3gramRate(text: String): Double = {
    val cps = Option(text).getOrElse("").codePoints().toArray
    if (cps.length < 3) return 0.0
    val n = cps.length - 2
    val counts = new java.util.HashMap[Long, Int](n * 2)
    var i = 0
    while (i < n) {
      val key = (cps(i).toLong << 42) | (cps(i + 1).toLong << 21) | cps(i + 2).toLong
      counts.merge(key, 1, (a, b) => a + b)
      i += 1
    }
    var repeated = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val v = it.next(); if (v > 1) repeated += v }
    repeated.toDouble / n
  }

  /** `evaluate_prediction` (`deid_eval.py:271-305`). */
  def evaluatePrediction(
      exampleId: String,
      inputText: String,
      predictionText: String,
      blocks: Seq[PiiBlock],
      bannedPhrases: Seq[String] = Nil
  ): ExampleReport = {
    val values = blocks.map(_.value).filter(v => v != null && v.trim.nonEmpty)
    val (recall, removed, total) = piiRemovalRecall(values, predictionText)
    val leak = total - removed

    val maskedInput = PiiMarkup.maskPiiBlocks(inputText, blocks)
    // (?U): Python str.split() splits on Unicode whitespace (NBSP etc.)
    val maskedNorm = maskedInput.split("(?U)\\s+").filter(_.nonEmpty).mkString(" ")
    val predNorm = Option(predictionText).getOrElse("")
      .split("(?U)\\s+").filter(_.nonEmpty).mkString(" ")
    val sim = if (maskedNorm.nonEmpty) SeqMatcher.ratio(maskedNorm, predNorm) else 1.0

    ExampleReport(
      exampleId,
      recall,
      total,
      leak,
      sim,
      1.0 - sim,
      typeConsistency(blocks, predictionText),
      repetition3gramRate(predictionText),
      formatCompliant(predictionText, bannedPhrases)
    )
  }

  /** `aggregate_reports` (`deid_eval.py:307-337`). */
  def aggregateReports(reports: Seq[ExampleReport]): Map[String, Double] = {
    if (reports.isEmpty)
      return Map("count" -> 0.0, "pii_removal_recall" -> 1.0, "pii_leak_rate" -> 0.0,
        "over_rewrite_rate" -> 0.0, "type_consistency" -> 1.0,
        "repetition_3gram_rate" -> 0.0, "format_compliance_rate" -> 1.0)
    val totalPii = reports.map(_.piiTotal.toLong).sum
    val totalLeaks = reports.map(_.piiLeakCount.toLong).sum
    def avg(xs: Seq[Double]) = if (xs.isEmpty) 0.0 else xs.sum / xs.length
    Map(
      "count" -> reports.length.toDouble,
      "pii_removal_recall" -> avg(reports.map(_.piiRemovalRecall)),
      "pii_total" -> totalPii.toDouble,
      "pii_leak_count" -> totalLeaks.toDouble,
      "pii_leak_rate" -> (if (totalPii > 0) totalLeaks.toDouble / totalPii else 0.0),
      "over_rewrite_rate" -> avg(reports.map(_.overRewriteRate)),
      "type_consistency" -> avg(reports.map(_.typeConsistency)),
      "repetition_3gram_rate" -> avg(reports.map(_.repetition3gramRate)),
      "format_compliance_rate" -> avg(reports.map(r => if (r.formatCompliant) 1.0 else 0.0))
    )
  }
}
