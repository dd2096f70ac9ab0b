package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side contract (schema, partition-friendly batch shapes, pure
  * column transforms) is real and tested; the actual codec work is STUBBED —
  * this container ships no image/audio libraries — behind
  * [[decodeFeaturesStub]] / [[frameSampleStub]], which are deterministic
  * fakes over the bytes. A production deployment swaps the stub leaf for a
  * real decoder (e.g. a JNI codec or `mapInPandas` + Pillow on PySpark) with
  * the SAME signature: `binary -> array<float>` / `array<binary>`.
  */
object Multimodal {

  /** media column schema: struct<data:binary, meta:struct<...>>. */
  val mediaMetaFields: Seq[String] =
    Seq("kind", "width", "height", "sample_rate", "n_frames")

  /** Attach a deterministic fake media payload to any table (test/bench
    * harness): bytes = utf8 of a projected string column, metadata derived
    * from byte stats. At 100 TB this column would come from the lakehouse.
    */
  def withFakeMedia(df: DataFrame, fromCol: String = "text"): DataFrame =
    df.withColumn("media", struct(
      encode(col(fromCol), "UTF-8").as("data"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(xxhash64(col(fromCol)), lit(3)) + 1).cast("int")).as("kind"),
        (pmod(xxhash64(col(fromCol), lit(1)), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col(fromCol), lit(2)), lit(1080)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (pmod(xxhash64(col(fromCol), lit(3)), lit(300)) + 1).cast("int").as("n_frames")
      ).as("meta")
    ))

  /** STUB feature extraction: binary -> array<float>(dim) via seeded hashes
    * of the bytes. Deterministic; same shape/partitioning as a real
    * featurizer. Replace the body for real decode.
    */
  def decodeFeaturesStub(data: Column, dim: Int = 16): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(data, i), lit(2000001)).cast("double") / 1000000.0d - 1.0d)
        .cast("float"))

  /** STUB frame sampling: split the payload into `n` byte slices (stands in
    * for decode-then-sample-frames; preserves batch shape semantics).
    */
  def frameSampleStub(data: Column, n: Int = 4): Column = {
    val len = length(data)
    transform(sequence(lit(0), lit(n - 1)), i =>
      substring(data, (i * (len / n) + 1).cast("int"),
        greatest(lit(1), (len / n).cast("int"))))
  }

  /** Resize metadata transform (pure metadata op — a real image resize would
    * replace `data` too; the stub keeps bytes and rewrites dims).
    */
  def resizeStub(media: Column, w: Int, h: Int): Column =
    struct(
      media.getField("data").as("data"),
      struct(
        media.getField("meta").getField("kind").as("kind"),
        lit(w).as("width"),
        lit(h).as("height"),
        media.getField("meta").getField("sample_rate").as("sample_rate"),
        media.getField("meta").getField("n_frames").as("n_frames")
      ).as("meta"))

  /** Featurize a media table: one narrow projection, embarrassingly
    * parallel; downstream ANN/dedup consume the feature column.
    */
  def featurize(df: DataFrame, dim: Int = 16): DataFrame =
    df.withColumn("features", decodeFeaturesStub(col("media.data"), dim))
      .withColumn("frames", frameSampleStub(col("media.data")))
}
