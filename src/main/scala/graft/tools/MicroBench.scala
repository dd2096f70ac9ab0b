package graft.tools

import graft.pipeline.DeidCore

object MicroBench {
  def main(args: Array[String]): Unit = {
    val texts = Array(
      "turn 0 of order 12345: Hi, my ID is A123456789 and phone 0912-345-678.",
      "turn 1 of order 12345: Email me at test@example.com or call 0912345678.",
      "turn 2 of order 12345: Med record M1234567 at 台北市信義路1號.",
      "turn 0 of order 12346: <html><head><title>T</title></head><body><p>Contact alice@example.com for order details now.</p></body></html>",
      "turn 1 of order 12346: Passport PA1234567 UBN 12345678 contract CN-000123.",
      "turn 2 of order 12346: Nothing sensitive in this routine confirmation turn.",
      "turn 0 of order 12347: SSN 123-45-6789 call +1-555-123-4567 at 123 Main Street.",
      "turn 1 of order 12347: Tool output: stats ok, rows=42, status=200."
    )
    val n = 45000
    // warmup
    var i = 0
    while (i < 5000) { DeidCore.process(texts(i % 8)); i += 1 }
    val phases = Seq(
      "detect" -> (() => { var k = 0L; var j = 0
        while (j < n) { k += DeidCore.detect(texts(j % 8), "zh", false).length; j += 1 }; k }),
      "full" -> (() => { var k = 0L; var j = 0
        while (j < n) { k += DeidCore.process(texts(j % 8)).entities.length; j += 1 }; k })
    )
    phases.foreach { case (name, f) =>
      val t0 = System.nanoTime()
      val k = f()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[micro] $name%-8s $dt%7.2fs  ${n / dt}%9.0f turns/s (1 thread)  chk=$k")
    }
  }
}
