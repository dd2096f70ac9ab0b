// scratch probe: duplication cost of the hashed classifier fold
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id", "text")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def best3(f: => Unit): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }.min
    val toks = split(lower(trim(col("text"))), "\\s+")
    def weight(t: org.apache.spark.sql.Column) = {
      val b = pmod(conv(substring(sha2(t, 256), 1, 6), 16, 10).cast("long"), lit(1048576L))
      (b * lit(2654435761L)) % lit(2001L) - lit(1000L)
    }
    val fold = aggregate(toks, lit(0L), (acc, t) => acc + weight(t))
    // sum only
    val t1 = best3(force(docs.select(col("doc_id"), fold.as("score_sum"))))
    // full operator
    val t2 = best3(force(graft.ops.WebClean.hashedLinearScore(docs)))
    // struct-with-finish: one fold, fields from inside the lambda
    val packed = aggregate(toks, lit(0L), (acc, t) => acc + weight(t),
      acc => struct(acc.as("score_sum")))
    val t3 = best3(force(docs.select(col("doc_id"), packed.getField("score_sum").as("s"),
      (packed.getField("score_sum") > 0L).as("k"))))
    println(f"[hq] sum_only=$t1%.2fs full=$t2%.2fs struct_2ref=$t3%.2fs")
    spark.stop()
  }
}
