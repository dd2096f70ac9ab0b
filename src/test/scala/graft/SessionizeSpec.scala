package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("stateful streaming sessions agree with the batch lag/window sessionize") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream
      .schema("event_id long, ts timestamp_ntz, user_id long, event_type string, " +
        "value double, props string")
      .parquet(s"$dir/in")
    val closed = Sessionize.sessions(stream, gapSeconds = 1800)
    val q = closed.writeStream
      .format("memory").queryName("closed_sessions")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streaming = spark.sql(
      "SELECT user_id, count(*) AS n_closed FROM closed_sessions GROUP BY user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch twin: the driver 'sessionize' query
    val batch = SparkEntry.queries("sessionize")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap

    // in a drained availableNow run each user's LAST session is still open:
    // closed == batch_sessions - 1 for every user
    assert(batch.nonEmpty)
    batch.foreach { case (user, nSessions) =>
      val nClosed = streaming.getOrElse(user, 0L)
      assert(nClosed == nSessions - 1,
        s"user=$user batch=$nSessions streamingClosed=$nClosed")
    }
  }
}
