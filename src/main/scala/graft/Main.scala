package graft

import graft.pipeline.{Deid, TurnsGen}
import graft.plans.CheckpointedRun
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI entry point — the Spark analogue of the reference's `main.py`
  * (`main.py:12-94`): `detect` stops after the detect stage and emits the
  * entities table only; `replace`/`black` run the full pipeline
  * (spark-submit --class graft.Main <jar> ...).
  *
  * {{{
  * graft.Main --input <turns parquet|sfDir> --output <dir>
  *            [--mode detect|replace|black] [--lang zh|en]
  *            [--buckets N] [--resume]
  * graft.Main --files <dir of txt/html/csv/xlsx/docx/pptx/pdf> --output <dir>
  *            [--mode ...] [--lang ...]   // per-file {stem}.deid{ext} outputs
  * graft.Main --gen-corpus N --output <dir> [--seed S]
  *            // distributed synthetic-dataset factory (sensitive_data_generator)
  * }}}
  *
  * With `--resume` the job uses the checkpointed bucketed writer and skips
  * buckets already marked done in the lineage table.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    if (opts.contains("files")) return filesMain(opts)
    if (opts.contains("gen-corpus")) return genCorpusMain(opts)
    val input = opts.getOrElse("input",
      sys.error("--input <turns parquet dir | testdata sf dir> required"))
    val output = opts.getOrElse("output", sys.error("--output <dir> required"))
    val mode = opts.getOrElse("mode", "replace")
    val lang = opts.getOrElse("lang", "zh")
    val buckets = opts.get("buckets").map(_.toInt).getOrElse(64)
    val resume = opts.contains("resume")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-deid")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val turns =
      if (new java.io.File(s"$input/orders.parquet").exists())
        TurnsGen.turns(spark, input) // testdata sf dir → synthesize
      else spark.read.parquet(input) // a real turns table

    Deid.normalizeCliMode(mode) match {
      case "detect" =>
        // reference `--mode detect` (`main.py:55-73`): registry→extract→
        // detect→normalize; prints/serializes entities only
        turns
          .withColumn("entities",
            graft.functions.gf.regexDetect(col("text"), lang))
          .select(col("conv_id"), col("turn_idx"), explode(col("entities")).as("e"))
          .select(col("conv_id"), col("turn_idx"), col("e.start"), col("e.end"),
            col("e.typ"), col("e.score"), col("e.source"))
          .repartition(col("conv_id"))
          .sortWithinPartitions("conv_id", "turn_idx", "start")
          .write.mode("overwrite").parquet(output)
      case m =>
        val redacted = Deid.redact(turns, mode = m, lang = lang)
        if (resume) {
          val status = CheckpointedRun.run(spark, redacted, output,
            inputFingerprint = input, ruleFingerprint = s"regex-$lang-$m", buckets)
          println(s"[graft] run=${status.runId} processed=${status.processed} " +
            s"skipped=${status.skipped} of ${status.total} buckets")
        } else {
          Deid.clusterForWrite(redacted).write.mode("overwrite").parquet(output)
        }
    }
    spark.stop()
  }

  /** `--gen-corpus N` mode: the reference's `sensitive_data_generator`
    * dataset factory as a distributed job (text/pdf/docx/xlsx/pptx trees +
    * structured csv/json + manifest under --output).
    */
  private def genCorpusMain(opts: Map[String, String]): Unit = {
    val n = opts("gen-corpus").toLong
    val output = opts.getOrElse("output", sys.error("--output <dir> required"))
    val seed = opts.get("seed").map(_.toLong).getOrElse(0L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-gen-corpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val manifest = graft.training.SyntheticCorpusJob.run(spark, output, n, seed)
    println(s"[graft] generated ${manifest.count()} items → $output")
    spark.stop()
  }

  /** `--files` mode: the reference CLI's per-file handler dispatch. */
  private def filesMain(opts: Map[String, String]): Unit = {
    val input = opts("files")
    val output = opts.getOrElse("output", sys.error("--output <dir> required"))
    val mode = opts.getOrElse("mode", "replace")
    val lang = opts.getOrElse("lang", "zh")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .appName("graft-deid-files")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (files, entities) =
      graft.sources.FilesJob.run(spark, input, output, Deid.normalizeCliMode(mode), lang)
    println(s"[graft] files=$files entities=$entities → $output")
    spark.stop()
  }

  private def parseArgs(args: Array[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--resume" => out += ("resume" -> "true"); i += 1
        case flag if flag.startsWith("--") && i + 1 < args.length =>
          out += (flag.stripPrefix("--") -> args(i + 1)); i += 2
        case other => sys.error(s"unknown argument: $other")
      }
    }
    out.result()
  }
}
