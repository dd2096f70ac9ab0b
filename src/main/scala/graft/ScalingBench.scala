package graft

import graft.pipeline.{Deid, TurnsGen}
import org.apache.spark.sql.SparkSession

/** North-rule scaling-efficiency evidence (BASELINE.md): the identical
  * redaction job on the identical on-disk input at two parallelism levels —
  * `local[8]` (N) and `local[32]` (4N) — reporting throughput at both and
  * efficiency = thr(4N) / (4 × thr(N)). No real cluster exists in this
  * sandbox; cores are the executor proxy (BASELINE.json note).
  *
  * Sequential SparkContexts in one JVM: the first is stopped before the
  * second starts, so the two runs never share executors.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nCores = args.lift(1).map(_.toInt).getOrElse(8)
    val n4Cores = args.lift(2).map(_.toInt).getOrElse(nCores * 4)
    val turnsPath = s"/tmp/graft_scaling_turns_${sfDir.replaceAll("[^0-9.]", "")}"

    val replicate = args.lift(3).map(_.toInt).getOrElse(8)

    // materialize input once; replicate so each measured run is long enough
    // (>= ~10 s at 4N) that fixed stage-scheduling overheads don't read as
    // scaling loss; 128 splits so both levels are input-parallel
    locally {
      val s = session(8)
      import org.apache.spark.sql.functions._
      val base = TurnsGen.turns(s, sfDir)
      val rep = base.crossJoin(
        s.range(replicate).select(col("id").as("rep")))
        .withColumn("conv_id", concat_ws("-", col("conv_id"), col("rep")))
        .drop("rep")
      rep.repartition(128).write.mode("overwrite").parquet(turnsPath)
      s.stop()
    }

    val results = Seq(nCores, n4Cores).map { cpus =>
      val s = session(cpus)
      val turns = s.read.parquet(turnsPath)
      val n = turns.count()
      // warmup
      Bench.force(Deid.redact(turns.limit(5000)))
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Bench.force(Deid.redact(turns))
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      s.stop()
      (cpus, n, best, n / best)
    }

    val (c8, n, t8, thr8) = results(0)
    val (c32, _, t32, thr32) = results(1)
    val eff = thr32 / (4.0 * thr8)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","sf":"$sfDir","turns":$n,"n_cores":$c8,"n4_cores":$c32,"sec_n":$t8%.3f,"sec_4n":$t32%.3f,"turns_per_sec_n":$thr8%.0f,"turns_per_sec_4n":$thr32%.0f}""")
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // small-input bench: shrink splits so both parallelism levels are
      // input-bound, not split-bound (see Bench.scala note)
      .config("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
