package graft.tools

import graft.pipeline.DeidCore
import graft.redact.Redactor
import graft.functions.{Digests, FakeProvider}

object RefProf2 {
  def main(args: Array[String]): Unit = {
    val base = "ID A123456789 and phone 0912345678. " +
      "Email test@example.com. Address 台北市信義路1號. "
    val sb = new StringBuilder
    while (sb.length < 10000) sb.append(base)
    val text = sb.substring(0, 10000)
    val resolved = DeidCore.detect(text, "zh", false)
    val ctx = Digests.sha256Hex(text)
    val sortedDesc = resolved.sortBy(e => -e.start)
    (1 to 10).foreach(_ => Redactor.replaceMode(text, resolved, Some(ctx)))
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => f)
      println(f"[prof2] $name%-14s ${(System.nanoTime() - t0) / 20e6}%8.2f ms")
    }
    time("slice-all") {
      sortedDesc.foreach(e => Redactor.cpSlice(text, e.start, e.end))
    }
    time("generate-all") {
      sortedDesc.foreach { e =>
        val orig = Redactor.cpSlice(text, e.start, e.end)
        FakeProvider.generateDeterministic(e.typ, orig, ctx)
      }
    }
    time("splice-all") {
      var cur = text
      sortedDesc.foreach(e => cur = Redactor.splice(cur, e.start, e.end, "XXXX"))
    }
    time("replaceMode")(Redactor.replaceMode(text, resolved, Some(ctx)))
  }
}
