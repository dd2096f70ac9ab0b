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

  final case class Level(cpus: Int, turns: Long, sec: Double, turnsPerSec: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nCores = args.lift(1).map(_.toInt).getOrElse(8)
    val n4Cores = args.lift(2).map(_.toInt).getOrElse(nCores * 4)
    val replicate = args.lift(3).map(_.toInt).getOrElse(8)
    val results = measure(sfDir, Seq(nCores, n4Cores), replicate, runs = 3)
    val Seq(lo, hi) = results
    val eff = hi.turnsPerSec / ((hi.cpus.toDouble / lo.cpus) * lo.turnsPerSec)
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","sf":"$sfDir","turns":${lo.turns},"n_cores":${lo.cpus},"n4_cores":${hi.cpus},"sec_n":${lo.sec}%.3f,"sec_4n":${hi.sec}%.3f,"turns_per_sec_n":${lo.turnsPerSec}%.0f,"turns_per_sec_4n":${hi.turnsPerSec}%.0f}""")
  }

  /** Measure redaction throughput at several core counts on identical input.
    * Passes are INTERLEAVED round-robin across levels (one pass at each
    * level, then the next round: 2,8,32, 2,8,32, …) rather than blocked per
    * level — on a shared VM a transient host-throttle burst then degrades
    * one ROUND (hitting all levels alike) instead of silently poisoning one
    * level's entire block, which once produced a superlinear 2→8 artifact
    * from an under-read 2-core baseline. Best-of-rounds per level.
    *
    * Creates (and stops) one SparkSession per pass — callers must not hold
    * an active session.
    */
  def measure(sfDir: String, levels: Seq[Int], replicate: Int, runs: Int): Seq[Level] = {
    val turnsPath = s"/tmp/graft_scaling_turns_${sfDir.replaceAll("[^0-9.]", "")}_$replicate"

    // materialize input once; replicate so each measured run is long enough
    // that fixed stage-scheduling overheads don't read as scaling loss;
    // 128 splits so every level is input-parallel
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

    val times = levels.map(c => c -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    var n = 0L
    for (_ <- 1 to runs; cpus <- levels) {
      val s = session(cpus)
      val turns = s.read.parquet(turnsPath)
      n = turns.count()
      Bench.force(Deid.redact(turns.limit(5000))) // warmup (JIT + codegen)
      val t0 = System.nanoTime()
      Bench.force(Deid.redact(turns))
      times(cpus) += (System.nanoTime() - t0) / 1e9
      s.stop()
    }
    levels.map { cpus =>
      val best = times(cpus).min
      Level(cpus, n, best, n / best)
    }
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
