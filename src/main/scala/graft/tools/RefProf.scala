package graft.tools

import graft.pipeline.DeidCore
import graft.redact.Redactor
import graft.functions.Digests

object RefProf {
  def main(args: Array[String]): Unit = {
    val base = "ID A123456789 and phone 0912345678. " +
      "Email test@example.com. Address 台北市信義路1號. "
    val sb = new StringBuilder
    while (sb.length < 10000) sb.append(base)
    val text = sb.substring(0, 10000)
    (1 to 30).foreach(_ => DeidCore.process(text))
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => f)
      println(f"[prof] $name%-12s ${(System.nanoTime() - t0) / 20e6}%8.2f ms")
    }
    val raw = DeidCore.detectRaw(text, "zh", false)
    val resolved = graft.detect.Resolver.resolve(raw)
    val ctx = Digests.sha256Hex(text)
    println(s"raw=${raw.length} resolved=${resolved.length}")
    time("detectRaw")(DeidCore.detectRaw(text, "zh", false))
    time("resolve")(graft.detect.Resolver.resolve(raw))
    time("replace")(Redactor.replaceMode(text, resolved, Some(ctx)))
    time("sha256")(Digests.sha256Hex(text))
    time("full")(DeidCore.process(text))
  }
}
