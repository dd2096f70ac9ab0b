package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.metrics.DeidEval
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class DeidEvalSpec extends AnyFunSuite {

  private val root = {
    val in = getClass.getResourceAsStream("/golden_deid_eval.json")
    require(in != null)
    try new ObjectMapper().readTree(in) finally in.close()
  }

  test("evaluate_prediction parity per example (G3-G7)") {
    root.get("cases").elements().asScala.foreach { c =>
      val blocks = DeidEval.detectPiiBlocks(c.get("input").asText())
      val rep = DeidEval.evaluatePrediction(
        c.get("id").asText(), c.get("input").asText(), c.get("pred").asText(),
        blocks, bannedPhrases = Seq("badword"))
      assert(rep.piiRemovalRecall == c.get("recall").asDouble(), s"${c.get("id")} recall")
      assert(rep.piiTotal == c.get("total").asInt(), s"${c.get("id")} total")
      assert(rep.piiLeakCount == c.get("leak").asInt(), s"${c.get("id")} leak")
      assert(rep.nonPiiSimilarity == c.get("sim").asDouble(), s"${c.get("id")} sim")
      assert(rep.overRewriteRate == c.get("over").asDouble(), s"${c.get("id")} over")
      assert(rep.typeConsistency == c.get("tc").asDouble(), s"${c.get("id")} tc")
      assert(rep.repetition3gramRate == c.get("rep3").asDouble(), s"${c.get("id")} rep3")
      assert(rep.formatCompliant == c.get("ok").asBoolean(), s"${c.get("id")} ok")
    }
  }

  test("aggregate_reports parity (G8)") {
    val reports = root.get("cases").elements().asScala.map { c =>
      val blocks = DeidEval.detectPiiBlocks(c.get("input").asText())
      DeidEval.evaluatePrediction(
        c.get("id").asText(), c.get("input").asText(), c.get("pred").asText(),
        blocks, bannedPhrases = Seq("badword"))
    }.toSeq
    val agg = DeidEval.aggregateReports(reports)
    val want = root.get("agg")
    want.properties().asScala.foreach { e =>
      assert(math.abs(agg(e.getKey) - e.getValue.asDouble()) < 1e-12, e.getKey)
    }
  }
}
