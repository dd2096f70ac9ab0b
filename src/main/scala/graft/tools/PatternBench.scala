package graft.tools

import graft.detect.RegexRules

object PatternBench {
  def main(args: Array[String]): Unit = {
    val texts = Array(
      "turn 0 of order 12345: Hi, my ID is A123456789 and phone 0912-345-678.",
      "turn 2 of order 12345: Med record M1234567 at 台北市信義路1號.",
      "turn 1 of order 12346: Passport PA1234567 UBN 12345678 contract CN-000123.",
      "turn 2 of order 12346: Nothing sensitive in this routine confirmation turn."
    )
    val n = 45000
    RegexRules.zh.zipWithIndex.foreach { case (rule, idx) =>
      var j = 0
      var hits = 0
      val t0 = System.nanoTime()
      while (j < n) {
        val m = rule.pattern.matcher(texts(j % 4))
        while (m.find()) hits += 1
        j += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[pat] $idx%2d ${rule.typ}%-20s $dt%7.2fs hits=$hits  ${rule.pattern.pattern().take(50)}")
    }
  }
}
