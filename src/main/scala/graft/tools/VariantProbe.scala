// dev tool: dump the per-variant constants of the deid_replace family so
// the SQL oracles can bake them as VALUES —
// sbt "runMain graft.tools.VariantProbe"
// Prints, per (lang, variant): distinct prefix-relative event projections
// (entity_type, original, rel_start, rel_end, repl_len) and the per-turn
// (n_entities, n_events). A variant printing more than one distinct set is
// NOT variant-constant and must not be oracled.
package graft.tools

import graft.pipeline.{Deid, TurnsGen}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object VariantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(
        new java.io.FileOutputStream("/tmp/variant_probe.txt"),
        java.nio.charset.StandardCharsets.UTF_8))

    val t = TurnsGen.turns(spark, sfDir)
      .withColumn("variant",
        ((col("conv_id").cast("long") * 7 + col("turn_idx") * 5) % 8).cast("int"))
      .withColumn("plen",
        length(concat(lit("turn "), col("turn_idx").cast("string"),
          lit(" of order "), col("conv_id"), lit(": "))))

    Seq("zh", "en").foreach { lang =>
      out.println(s"==== lang=$lang ====")
      val r = Deid.redact(t, lang = lang)
        .join(t.select("conv_id", "turn_idx", "variant", "plen"),
          Seq("conv_id", "turn_idx"))
      val perTurn = r.select(col("variant"),
          size(col("entities")).as("n_entities"), size(col("events")).as("n_events"))
        .distinct().orderBy("variant", "n_entities").collect()
      out.println("-- per-turn counts (variant, n_entities, n_events):")
      perTurn.foreach(row => out.println(s"  $row"))
      val ev = r.select(col("variant"), col("plen"), explode(col("events")).as("ev"))
        .select(col("variant"), col("ev.entity_type"), col("ev.original"),
          (col("ev.start") - col("plen")).as("rel_start"),
          (col("ev.end") - col("plen")).as("rel_end"),
          length(col("ev.replacement")).as("repl_len"))
        .distinct()
        .orderBy("variant", "rel_start", "entity_type", "rel_end", "repl_len")
        .collect()
      out.println("-- events (variant, type, original, rel_start, rel_end, repl_len):")
      ev.foreach(row => out.println(s"  $row"))
    }
    out.close()
    println("wrote /tmp/variant_probe.txt")
    spark.stop()
  }
}
