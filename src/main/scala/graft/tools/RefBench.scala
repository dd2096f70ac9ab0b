package graft.tools

import graft.pipeline.DeidCore

/** Head-to-head with the reference's own bench protocol
  * (`scripts/benchmark_pipeline.py`: 10k-char synthetic zh text, warmup,
  * measured runs, p50/p95 with the exact lower-nearest-rank formula).
  * The reference side is run in-place with tools/run_ref_bench.py (cv2/torch
  * stubbed — the golden environment); Bench embeds both sides per round as
  * the `ref_head_to_head` block.
  */
object RefBench {

  /** The protocol's 10k-char zh text (benchmark_pipeline.py:35-42). */
  val text: String = {
    val base = "ID A123456789 and phone 0912345678. " +
      "Email test@example.com. Address 台北市信義路1號. "
    val sb = new StringBuilder
    while (sb.length < 10000) sb.append(base)
    sb.substring(0, 10000)
  }

  /** (p50_ms, p95_ms, mean_ms, entities) over `runs` measured runs of the
    * single-text detect→replace pipeline, after JIT warmup.
    */
  def measure(runs: Int = 10): (Double, Double, Double, Int) = {
    var r = DeidCore.process(text) // JIT warmup needs many runs
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
    (p50, p95, samples.sum / runs, r.entities.length)
  }

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(10)
    val (p50, p95, mean, entities) = measure(runs)
    println(f"""{"p50_ms":$p50%.3f,"p95_ms":$p95%.3f,"mean_ms":$mean%.3f,"entities":$entities,"chars":10000}""")
  }
}
