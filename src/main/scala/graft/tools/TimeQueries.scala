// scratch: sbt "runMain graft.tools.TimeQueries <sfDir>"
package graft.tools

import org.apache.spark.sql.SparkSession

object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case e: Throwable => -1L }
      println(f"[time] $name%-25s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    spark.stop()
  }
}
