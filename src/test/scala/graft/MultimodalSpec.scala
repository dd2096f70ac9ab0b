package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val media = Multimodal.withFakeMedia(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")).cache()

  test("media schema: binary payload + typed metadata struct") {
    val schema = media.schema("media").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema("data").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq == Multimodal.mediaMetaFields)
    val kinds = media.select($"media.meta.kind").distinct()
      .as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
  }

  test("stub featurizer: fixed dim, deterministic, bounded values") {
    val f = Multimodal.featurize(media, dim = 16)
    val dims = f.select(size($"features")).distinct().as[Int].collect().toSeq
    assert(dims == Seq(16))
    val r1 = f.select($"doc_id", $"features").orderBy("doc_id").limit(5).collect()
    val r2 = Multimodal.featurize(media, dim = 16)
      .select($"doc_id", $"features").orderBy("doc_id").limit(5).collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    val bounds = f.select(explode($"features").as("v"))
      .agg(min("v"), max("v")).first()
    assert(bounds.getFloat(0) >= -1.0f && bounds.getFloat(1) <= 1.0f)
  }

  test("frame sampling: n byte slices per payload, non-empty") {
    val f = Multimodal.featurize(media)
    val sizes = f.select(size($"frames")).distinct().as[Int].collect().toSeq
    assert(sizes == Seq(4))
    val empties = f.select(explode($"frames").as("fr"))
      .where(length($"fr") === 0).count()
    assert(empties == 0)
  }

  test("resize stub rewrites dims only") {
    val r = media.select(Multimodal.resizeStub($"media", 64, 64).as("m"))
    assert(r.select($"m.meta.width").distinct().as[Int].collect().toSeq == Seq(64))
    val origSum = media.select(length($"media.data").as("l")).agg(sum("l")).first().getLong(0)
    val keptSum = r.select(length($"m.data").as("l")).agg(sum("l")).first().getLong(0)
    assert(keptSum == origSum)
  }

  test("featurize plan is one narrow projection (no shuffle)") {
    val plan = Multimodal.featurize(media).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
  }

  test("features feed ANN: cosine over stub features works end-to-end") {
    val f = Multimodal.featurize(media, dim = 16)
      .select($"doc_id".as("vec_id"), $"features".as("embedding"))
    val knn = graft.ops.Similarity.bruteForceTopK(f, f.where($"vec_id" < 3),
      k = 2, idCol = "vec_id", vecCol = "embedding")
    assert(knn.count() == 6)
  }
}
