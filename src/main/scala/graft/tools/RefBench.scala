package graft.tools

import graft.pipeline.DeidCore

/** Head-to-head with the reference's own bench protocol
  * (`scripts/benchmark_pipeline.py`: 10k-char synthetic zh text, 1 warmup,
  * 10 measured runs, p50/p95 with the exact lower-nearest-rank formula).
  * The reference side is run in-place with tools/run_ref_bench (cv2 stubbed).
  */
object RefBench {
  def main(args: Array[String]): Unit = {
    val base = "ID A123456789 and phone 0912345678. " +
      "Email test@example.com. Address 台北市信義路1號. "
    val sb = new StringBuilder
    while (sb.length < 10000) sb.append(base)
    val text = sb.substring(0, 10000)

    val runs = args.headOption.map(_.toInt).getOrElse(10)
    var r = DeidCore.process(text) // warmup (JIT needs more; do a few)
    (1 to 50).foreach(_ => r = DeidCore.process(text))
    val samples = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      r = DeidCore.process(text)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    val p50 =
      if (runs % 2 == 1) samples(runs / 2)
      else (samples(runs / 2 - 1) + samples(runs / 2)) / 2
    val p95 = samples((0.95 * (runs - 1)).toInt)
    println(f"""{"p50_ms":$p50%.3f,"p95_ms":$p95%.3f,"mean_ms":${samples.sum / runs}%.3f,"entities":${r.entities.length},"chars":10000}""")
  }
}
