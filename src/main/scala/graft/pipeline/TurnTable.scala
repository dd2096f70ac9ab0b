package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table-layer abstraction (SURVEY §7.1): locally hash-BUCKETED parquet
  * catalog tables; production swaps in an Iceberg catalog with the same
  * bucket transform (`bucket(N, conv_id)`) — one config change.
  *
  * Bucketing by `conv_id` co-locates every join/groupBy on the conversation
  * key: two tables bucketed the same way sort-merge-join with ZERO shuffle
  * exchanges (pinned in BucketedJoinSpec). At 10^12 turns this is the
  * difference between re-shuffling 100 TB per join and none.
  */
object TurnTable {

  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int = 64,
      sortCols: Seq[String] = Seq("conv_id", "turn_idx")
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "conv_id")
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
