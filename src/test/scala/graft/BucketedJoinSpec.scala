package graft

import graft.pipeline.{Deid, TurnTable, TurnsGen}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedJoinSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  test("co-located join: same-bucketed tables join with zero shuffle exchanges") {
    Seq("turns_b", "redacted_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val turns = TurnsGen.turns(spark, "/root/testdata/sf0.001")
    TurnTable.writeBucketed(turns, "turns_b", buckets = 8)
    TurnTable.writeBucketed(Deid.redact(turns), "redacted_b", buckets = 8)

    val joined = TurnTable.read(spark, "turns_b").as("t")
      .join(TurnTable.read(spark, "redacted_b").as("r"),
        col("t.conv_id") === col("r.conv_id") && col("t.turn_idx") === col("r.turn_idx"))
      .select(col("t.conv_id"), col("t.turn_idx"), col("r.text"))

    // disable auto-broadcast so the join strategy itself is under test, and
    // let bucket partitioning (conv_id) satisfy the (conv_id, turn_idx)
    // clustering requirement — the documented knob for subset-key bucketed
    // joins
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == turns.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed groupBy on the bucket key avoids the shuffle") {
    val agg = TurnTable.read(spark, "turns_b")
      .groupBy("conv_id").agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed groupBy should not shuffle:\n$plan")
    assert(agg.count() > 0)
  }
}
