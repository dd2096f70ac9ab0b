// dev tool: best-of-N wall time for ONE driver query without the full bench —
// sbt "runMain graft.tools.TimeQuery <sfDir> <query>[,<query>…] [runs]"
// Uses the bench protocol pieces that matter for a fair read: noop-sink
// force (count() lets Catalyst eliminate the projection), 1 MB splits so
// tiny inputs parallelize, per-run cache clear, best-of-N on this
// throttling shared VM.
package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"[time] $name best=${times.min}%.3fs runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
