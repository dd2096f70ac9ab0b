package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic `turns` table (BASELINE.json `input_hint` shape)
  * derived purely from the driver-generated `orders` parquet, so that the
  * SAME SQL reproduces it in both Spark and DuckDB (oracle parity).
  *
  * 3 turns per order; text mixes plain prose, zh/en PII values from the
  * reference's fixture battery (`tests/pii_test_suite.py:20-24`,
  * `scripts/benchmark_pipeline.py:35-38`) and a small HTML document with
  * boilerplate (nav/script/style) around a PII-bearing paragraph.
  */
object TurnsGen {

  /** Shared SQL body — valid in BOTH Spark SQL and DuckDB over a table named
    * `orders`. No timestamp column (dialects diverge there); `ts` is added
    * Spark-side in [[turns]].
    */
  val turnsSqlBody: String =
    """SELECT CAST(o.o_orderkey AS STRING) AS conv_id,
      |       t.turn_idx AS turn_idx,
      |       CASE (t.turn_idx % 3) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
      |       CONCAT('turn ', CAST(t.turn_idx AS STRING), ' of order ',
      |              CAST(o.o_orderkey AS STRING), ': ',
      |         CASE CAST((o.o_orderkey * 7 + t.turn_idx * 5) % 8 AS INTEGER)
      |           WHEN 0 THEN 'Hi, my ID is A123456789 and phone 0912-345-678.'
      |           WHEN 1 THEN 'Email me at test@example.com or call 0912345678.'
      |           WHEN 2 THEN 'Med record M1234567 at 台北市信義路1號.'
      |           WHEN 3 THEN '<html><head><title>T</title><style>p{color:red}</style></head><body><nav><a href="/">home</a> <a href="/x">about</a></nav><p>Contact alice@example.com for order details now.</p><script>var x=1;</script></body></html>'
      |           WHEN 4 THEN 'Passport PA1234567 UBN 12345678 contract CN-000123.'
      |           WHEN 5 THEN 'Nothing sensitive in this routine confirmation turn.'
      |           WHEN 6 THEN 'SSN 123-45-6789 call +1-555-123-4567 at 123 Main Street.'
      |           ELSE 'Tool output: stats ok, rows=42, status=200.'
      |         END) AS text,
      |       CASE WHEN (t.turn_idx % 3) = 2 THEN 'search' ELSE NULL END AS tool
      |FROM orders o CROSS JOIN (VALUES (0), (1), (2)) AS t(turn_idx)""".stripMargin

  /** DuckDB variant for oracle SQL: reads the parquet directly. The driver
    * registers tables by parquet basename, so `orders` resolves there too.
    */
  def duckdbCte: String = s"WITH turns AS (${turnsSqlBody.replace("\n", " ")})"

  /** The turns DataFrame (full input_hint schema incl. ts). */
  def turns(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("orders")
    spark.sql(turnsSqlBody)
      .withColumn("ts", expr(
        "timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, " +
          "cast(conv_id AS LONG) % 86400 + turn_idx)"))
  }

  /** Skewed variant for scale testing: one mega-conversation holding ~30% of
    * all turns plus ~50 normal ones, with turn_idx renumbered 0..n-1 within
    * each conversation (the salt `floor(turn_idx / bucket)` only spreads a
    * conversation whose turn indexes actually run its length).
    */
  def skewedTurns(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    turns(spark, sfDir)
      .withColumn("conv_id",
        when(col("conv_id").cast("long") % 10 < 3, lit("mega-0"))
          .otherwise(concat(lit("c"),
            (col("conv_id").cast("long") % 50).cast("string"))))
      .withColumn("turn_idx",
        (row_number().over(Window.partitionBy("conv_id").orderBy("ts", "text")) - 1)
          .cast("int"))
  }
}
