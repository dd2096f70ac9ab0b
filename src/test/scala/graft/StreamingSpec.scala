package graft

import graft.pipeline.{Deid, TurnsGen}
import graft.streaming.DeidStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("streaming redaction over a file source matches the batch transform") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val turns = TurnsGen.turns(spark, "/root/testdata/sf0.001").limit(300)
    turns.write.mode("overwrite").parquet(s"$dir/in")

    val streamed = DeidStream.redact(DeidStream.readTurns(spark, s"$dir/in"))
    val q = DeidStream.writer(streamed, s"$dir/out", s"$dir/ckpt").start()
    q.awaitTermination(120000)

    val got = spark.read.parquet(s"$dir/out")
    val want = Deid.redact(spark.read.parquet(s"$dir/in"))
    assert(got.count() == want.count())
    val h = (df: org.apache.spark.sql.DataFrame) =>
      df.selectExpr("sum(hash(conv_id, turn_idx, text))").first().getLong(0)
    assert(h(got) == h(want))

    // restart with the same checkpoint: no new files -> no new rows
    val q2 = DeidStream.writer(streamed, s"$dir/out", s"$dir/ckpt").start()
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$dir/out").count() == want.count())
  }

  test("windowed entity counts with watermark produce rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2").toString
    TurnsGen.turns(spark, "/root/testdata/sf0.001").limit(200)
      .write.mode("overwrite").parquet(s"$dir/in")
    val counts = DeidStream.entityCountsByWindow(DeidStream.readTurns(spark, s"$dir/in"))
    val q = counts.writeStream
      .format("memory").queryName("win_counts")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val rows = spark.sql("SELECT * FROM win_counts")
    assert(rows.count() > 0)
    assert(rows.columns.toSet == Set("window", "typ", "count"))
  }
}
