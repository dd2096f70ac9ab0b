package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift monitoring between two snapshots — the continuous-ingest
  * health check a production corpus build runs per increment (did the
  * crawl's language/topic/garbage mix shift?): Pearson's χ² over HASHED
  * token-bucket histograms (the [[Dsir.bucketHistogram]] feature space, so
  * two 100-TB snapshots compress to ≤ nBuckets rows each BEFORE any
  * comparison happens).
  *
  * For the 2×C contingency table of bucket counts (o1_b, o2_b) with totals
  * N1, N2, the per-bucket χ² contribution reduces algebraically to
  *
  *   term_b = (o1_b·N2 − o2_b·N1)² / (N1·N2·(o1_b+o2_b))
  *
  * — the difference D_b = o1_b·N2 − o2_b·N1 and the denominator are EXACT
  * BIGINTs (guarded into int64 like [[Retrieval.bm25TopK]]); one double
  * square + one division per bucket, folded in bucket order, keeps the
  * whole statistic bit-exact cross-engine (no ln — the reason χ² is used
  * here instead of PSI/KL, whose logs are not bit-stable; χ² is the
  * standard frequentist drift test anyway). The per-bucket terms are the
  * actionable half: the top drifting buckets localize WHAT changed, and
  * joining a sample of each bucket's tokens back names it.
  *
  * Scale shape: everything after the two histogram scans is bounded by
  * nBuckets — a full-outer equi-join of two tiny frames plus an in-row
  * fold. Degrees of freedom = populated buckets − 1.
  */
object Drift {

  /** Per-bucket χ² contributions of two (bucket, cnt) histograms
    * ([[Dsir.bucketHistogram]] output; missing buckets count 0). Output
    * (bucket, o1, o2, term) — `term` as above, exact-rational operands.
    * Empty-sided inputs are refused (a drift test against an empty
    * snapshot is meaningless and would divide by N=0).
    */
  def chiSquareDrift(hist1: DataFrame, hist2: DataFrame,
      safeBound: Double = 9.2e18): DataFrame = {
    val h1 = hist1.select(col("bucket"), col("cnt").as("o1"))
    val h2 = hist2.select(col("bucket"), col("cnt").as("o2"))
    val n1f = h1.agg(coalesce(sum("o1"), lit(0L)).as("n1"))
    val n2f = h2.agg(coalesce(sum("o2"), lit(0L)).as("n2"))
    val joined = h1.join(h2, Seq("bucket"), "full_outer")
      .select(col("bucket"), coalesce(col("o1"), lit(0L)).as("o1"),
        coalesce(col("o2"), lit(0L)).as("o2"))
      .crossJoin(broadcast(n1f.crossJoin(n2f)))
    // exactness guard: |D| = |o1·n2 − o2·n1| and den = n1·n2·(o1+o2) must
    // stay in int64; a 100-TB token count exceeds it → pre-aggregate to
    // coarser buckets or drift-test a deterministic hash sample
    val dApprox = greatest(col("o1").cast("double") * col("n2").cast("double"),
      col("o2").cast("double") * col("n1").cast("double"))
    val denApprox = col("n1").cast("double") * col("n2").cast("double") *
      (col("o1") + col("o2")).cast("double")
    val d = col("o1") * col("n2") - col("o2") * col("n1")
    val den = col("n1") * col("n2") * (col("o1") + col("o2"))
    joined
      .withColumn("term",
        when(col("n1") === 0 || col("n2") === 0,
          raise_error(lit("chiSquareDrift: a snapshot histogram is empty - " +
            "drift against an empty snapshot is undefined")).cast("double"))
        .when(dApprox >= lit(safeBound) || denApprox >= lit(safeBound),
          raise_error(lit("chiSquareDrift: 64-bit exactness domain exceeded " +
            "(snapshot token counts too large for BIGINT-exact terms); " +
            "coarsen buckets or drift-test a hash sample")).cast("double"))
        .otherwise((d.cast("double") * d.cast("double")) / den.cast("double")))
      .select(col("bucket"), col("o1"), col("o2"), col("term"))
  }

  /** Total χ² + degrees of freedom from [[chiSquareDrift]] output: the
    * terms fold in BUCKET order (sort_array over one collected row —
    * bounded by nBuckets), so the total replays bit-exactly; df =
    * populated buckets − 1.
    */
  def chiSquareTotal(perBucket: DataFrame): DataFrame =
    perBucket
      .select(struct(col("bucket"), col("term")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("arr"),
        count(lit(1)).as("n_buckets"))
      .select(
        aggregate(col("arr"), lit(0.0d),
          (acc, x) => acc + x.getField("term")).as("chi2"),
        (col("n_buckets") - 1L).as("df"))
}
