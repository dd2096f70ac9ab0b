package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the k-means-bucketed
  * scale path beside the LSH one ([[Similarity.lshTopK]]):
  *
  *  - '''train''': deterministic seeded init (the k corpus vectors with the
  *    smallest `xxhash64(id, seed)` — no wall clock, no RNG state) followed
  *    by `iters` Lloyd rounds expressed as DataFrame aggregations — the
  *    corpus never collects; only the k×dim centroid table reaches the
  *    driver (k ≤ a few thousand even at 10⁹ vectors);
  *  - '''index''': one narrow pass assigns every vector its nearest
  *    centroid id ([[graft.functions.NearestCentroidsExpr]], primitive
  *    loop) — the inverted lists are just a `cid` column, so a parquet
  *    table partitioned/bucketed by `cid` gives list-pruned scans for free;
  *  - '''query''': each query probes its `nprobe` nearest centroids; the
  *    candidate set is the union of those lists; exact cosine ranks them.
  *    `nprobe = k` degrades to exact brute force — pinned against the
  *    brute-force oracle, which makes the IVF plumbing hash-verifiable.
  *
  * Shuffle shape: train = `iters` shuffles of (cid, partial sums) — k groups
  * only; query = one shuffle of the candidate join on `cid`. Probe cost is
  * `nprobe/k` of the corpus per query — the knob the caller tunes.
  */
object Ivf {

  /** Deterministic k-means training; returns k centroids (k×dim doubles).
    *
    * `sampleCap > 0` fits the centroids on a DETERMINISTIC sample — the
    * `sampleCap` vectors with the smallest `xxhash64(id, seed)` (a seeded
    * uniform draw with no RNG state, computed with one TakeOrdered pass:
    * per-partition top-N heaps, no full sort) — instead of `iters` full
    * scans of the corpus. Centroid quality saturates at sample sizes of
    * ~100–1000 × k, so a fixed cap makes train cost FLAT in corpus size:
    * one scan for the sample, then Lloyd rounds over the cached sample
    * only (ScaleProbe records the flatness). Because the k-vector init
    * takes the k hash-smallest of the SAME ordering, the initial centroids
    * are identical with or without sampling (k ≤ sampleCap); only the
    * Lloyd refinements see fewer rows. `nprobe = k` queries stay EXACT
    * under any centroid set — sampling trades only approximate-regime
    * recall, never correctness of the pinned paths.
    */
  def train(
      corpus: DataFrame,
      k: Int = 16,
      iters: Int = 3,
      dim: Int = 64,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      seed: Long = 42L,
      sampleCap: Int = 0,
      init: String = "hash"
  ): Array[Array[Double]] = {
    require(sampleCap == 0 || sampleCap >= k,
      s"sampleCap must be 0 (full corpus) or >= k, got $sampleCap < $k")
    require(init == "hash" || init == "maximin",
      s"init must be 'hash' or 'maximin', got '$init'")
    require(init == "hash" || sampleCap > 0,
      "init='maximin' runs farthest-point selection DRIVER-side over the " +
        "deterministic sample, so it requires sampleCap > 0 (the " +
        "driver-bounded-collect contract: cap × dim doubles)")
    val full = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
    val base =
      if (sampleCap <= 0) full
      else full.orderBy(xxhash64(col("id"), lit(seed)), col("id")).limit(sampleCap)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // seeded init: k hash-smallest vectors (deterministic, one pass +
      // top-k), or deterministic farthest-point (maximin — the kmeans++
      // idea with argmax instead of D²-sampling, so no RNG state): start
      // from the hash-smallest vector, repeatedly add the sample vector
      // farthest from the chosen set (ties by sample order). Better cell
      // coverage on hard corpora (+0.05-0.09 recall@5 at nprobe=4 on the
      // fixture); costs one bounded collect of the sample.
      var centroids: Array[Array[Double]] =
        if (init == "hash")
          base.orderBy(xxhash64(col("id"), lit(seed)), col("id"))
            .limit(k)
            .select(col("vec"))
            .collect()
            .map(_.getSeq[Double](0).toArray)
        else {
          val sample = base
            .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
            .select(col("vec")).collect().map(_.getSeq[Double](0).toArray)
          def dist2(a: Array[Double], b: Array[Double]): Double = {
            var s = 0.0; var i = 0
            while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
            s
          }
          val picked = scala.collection.mutable.ArrayBuffer(sample.head)
          val minD = sample.map(v => dist2(v, sample.head))
          while (picked.length < k) {
            var bi = 0; var bd = -1.0; var i = 0
            while (i < sample.length) {
              if (minD(i) > bd) { bd = minD(i); bi = i }; i += 1
            }
            val nv = sample(bi)
            picked += nv
            var j = 0
            while (j < sample.length) {
              val d = dist2(sample(j), nv); if (d < minD(j)) minD(j) = d
              j += 1
            }
          }
          picked.toArray
        }
      val dims = (0 until dim).map(d => avg(element_at(col("vec"), d + 1)).as(s"c$d"))
      var it = 0
      while (it < iters) {
        val assigned = base.select(
          graft.functions.gf.nearestCentroids(col("vec"), centroids.toIndexedSeq.map(_.toIndexedSeq), 1)
            .getItem(0).as("cid"),
          col("vec"))
        val updated = assigned.groupBy("cid").agg(dims.head, dims.tail: _*)
          .collect()
          .map(r => r.getInt(0) -> (0 until dim).map(d => r.getDouble(d + 1)).toArray)
          .toMap
        // empty clusters keep their previous centroid (standard Lloyd detail)
        centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
        it += 1
      }
      centroids
    } finally if (sampleCap > 0) base.unpersist()
  }

  /** (id, cid, vec) — the indexed corpus; persist/bucket by cid at scale. */
  def assign(
      corpus: DataFrame,
      centroids: Array[Array[Double]],
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame =
    corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("vec"))
      .withColumn("cid",
        graft.functions.gf.nearestCentroids(col("vec"),
          centroids.toIndexedSeq.map(_.toIndexedSeq), 1).getItem(0))

  /** Top-k neighbors for `queries` against `corpus` probing `nprobe` lists.
    * `queries` is expected small (broadcast); the corpus shuffles once on
    * `cid`.
    */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      centroids: Array[Array[Double]],
      k: Int = 5,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cseq = centroids.toIndexedSeq.map(_.toIndexedSeq)
    val indexed = assign(corpus, centroids, idCol, vecCol)
    val q = broadcast(queries
      .select(col(idCol).as("q_id"), col(vecCol).cast("array<double>").as("q_vec"))
      .withColumn("cid", explode(
        graft.functions.gf.nearestCentroids(col("q_vec"), cseq, nprobe))))
    q.join(indexed, Seq("cid"))
      .where(col("q_id") =!= col("id"))
      .select(col("q_id"), col("id").as("n_id"),
        graft.functions.gf.cosineSim(col("q_vec"), col("vec")).as("sim"))
      // a candidate can surface from several probed lists only if ids
      // collide across cids — they can't (one cid per corpus vector), so no
      // dedupe needed before ranking
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("sim"), asc("n_id"))))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), col("sim"))
  }
}
