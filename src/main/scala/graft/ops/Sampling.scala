package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic (hash-holdout) sampling for corpus mixture construction —
  * the pretraining step that downsamples over-represented sources to hit
  * target mixture weights (reference analogue: the per-dataset `limit` /
  * shuffle mix of `training/data_pipeline.py`; here generalized to
  * per-stratum rates the way web-scale pipelines weight crawl vs curated
  * sources).
  *
  * Everything is a map-only projection — no shuffle, no RNG state: at
  * 100 TB this runs inside the scan stage and the same row always gets the
  * same keep/drop decision (re-runs, retries and incremental loads agree),
  * which is why hash-holdout beats `rand()` sampling for corpus builds.
  */
object Sampling {

  /** Deterministic per-row bucket in `[0, buckets)` from an integer id: a
    * Knuth multiplicative congruential hash over a bounded residue —
    * `((id mod 1048573) * 2654435761) mod buckets` — pure BIGINT arithmetic
    * (max intermediate ≈ 2.8e15, far inside int64), so a SQL oracle replays
    * it bit-for-bit with `%` and `*`. Caveat: mod-extraction keeps the map
    * LINEAR in the id below the prime residue, so an arithmetic id sequence
    * (every k-th id) walks evenly spaced bucket stripes of stride
    * `761·k mod 1000` — per-stratum kept fractions still converge to
    * rate/1000 with granularity `gcd(761·k, 1000)/1000`, but a SMALL
    * arithmetic stratum can skew (ids 0,4,…,36 all land below bucket 400).
    * Production swap: [[avalancheBucket]] gives a full-avalanche mix with
    * identical plumbing when oracle replay isn't needed — and since round
    * 7 it IS the samplers' default; this multiplicative map is the
    * explicitly-opted-into oracle-replay variant.
    */
  def mulHashBucket(id: Column, buckets: Int = 1000): Column =
    pmod(pmod(id.cast("long"), lit(1048573L)) * lit(2654435761L), lit(buckets.toLong))

  /** Full-avalanche bucket in `[0, buckets)` — `pmod(xxhash64(id),
    * buckets)` — the DEFAULT keep/drop hash for [[stratifiedSample]] and
    * [[resampleCopies]]: every input bit diffuses to every output bit, so
    * arithmetic id strata (every k-th id) see no bucket stripes and no
    * stratum-size bias, unlike [[mulHashBucket]]'s linear-below-the-residue
    * map. Not SQL-replayable (DuckDB has no xxhash64); callers that need a
    * bit-exact SQL oracle pass [[mulHashBucket]] explicitly and accept its
    * documented small-arithmetic-stratum caveat.
    */
  def avalancheBucket(id: Column, buckets: Int = 1000): Column =
    pmod(xxhash64(id), lit(buckets.toLong))

  /** Square-root temperature source-balancing rates (the α = 0.5 sampling
    * temperature of multilingual/multi-source pretraining mixes): keep the
    * SMALLEST stratum whole and downsample every LARGER stratum toward the
    * α = 0.5 mixture, `rate_s = ⌊1000·√(n_min / n_s)⌋` permille — kept
    * mass per stratum is then `n_s·√(n_min/n_s) = √(n_min·n_s) ∝ √n_s`,
    * exactly the `p(s) ∝ n_s^0.5` target (and the keep-only counterpart of
    * [[sqrtUpsampleRates]], whose boost already realizes `∝ √n_s` from
    * above). The round-6 form normalized by n_MAX — `√(n_s/n_max)` cuts
    * SMALL strata hardest (kept ∝ n_s^1.5, a SHARPENER, α = 1.5) — fixed
    * in round 7; its oracle replayed the arithmetic faithfully either way.
    * Relative-to-min normalization (not sum-normalized) keeps every step a
    * correctly rounded IEEE op — one divide, one sqrt, one multiply, one
    * floor — so a SQL oracle replays the rates bit-for-bit; a Σ√n_j
    * normalizer would hang the result on float summation ORDER, which
    * neither engine pins.
    *
    * Driver-side on per-stratum counts (rows bounded by #distinct sources —
    * the same driver-bounded-collect contract as IVF's k×dim centroids);
    * feed the result straight into [[stratifiedSample]].
    */
  def sqrtTemperatureRates(counts: Map[String, Long]): Map[String, Int] = {
    require(counts.nonEmpty, "sqrtTemperatureRates: no strata")
    require(counts.values.forall(_ > 0), "sqrtTemperatureRates: empty stratum")
    val nMin = counts.values.min.toDouble
    counts.map { case (s, n) =>
      s -> math.floor(1000.0 * math.sqrt(nMin / n.toDouble)).toInt
    }
  }

  /** Square-root temperature UP-sampling rates — the other half of the
    * α = 0.5 mix: keep the largest stratum whole and boost every smaller
    * stratum toward balance, `rate_s = ⌊1000·√(n_max / n_s)⌋ ≥ 1000`
    * permille (mT5's low-resource-language boost). Same IEEE-exact op
    * chain as [[sqrtTemperatureRates]]; feed into [[resampleCopies]].
    */
  def sqrtUpsampleRates(counts: Map[String, Long]): Map[String, Int] = {
    require(counts.nonEmpty, "sqrtUpsampleRates: no strata")
    require(counts.values.forall(_ > 0), "sqrtUpsampleRates: empty stratum")
    val nMax = counts.values.max.toDouble
    counts.map { case (s, n) =>
      s -> math.floor(1000.0 * math.sqrt(nMax / n.toDouble)).toInt
    }
  }

  /** Deterministic stratified RE-sampling, unifying down- and up-sampling:
    * a rate of r permille emits `⌊r/1000⌋` whole copies of every row plus
    * one more iff `bucket < r mod 1000` — so r = 500 keeps half the rows
    * once (the [[stratifiedSample]] decision), r = 2500 emits 2 copies
    * always and a 3rd for half the rows; per-stratum output size converges
    * to `n_s · r/1000` while staying a pure function of the id (re-runs
    * and retries emit the identical multiset — the property `rand()`-based
    * upsampling loses on task retry at 100 TB). Still map-only: the copy
    * fan-out is a generate inside the scan stage, no shuffle.
    *
    * Output: input columns + `bucket`, `rate`, `n_copies`, `copy_idx`
    * (one row per copy, `0 ≤ copy_idx < n_copies`; rows with
    * `n_copies = 0` disappear). Copy-count arithmetic is integer + one
    * exact floor-division, so a SQL oracle replays it bit-for-bit with
    * `unnest(range(n_copies))` when `bucketOf` is SQL-replayable
    * ([[mulHashBucket]]); the default is the unbiased [[avalancheBucket]].
    * The per-row generate materializes `⌈r/1000⌉` array slots, so extreme
    * boosts are REFUSED: every effective rate must stay ≤ `capPermille`
    * (default 100000‰ = 100×, the mT5-style boost ceiling) — a 10⁶‰ rate
    * would build a 1000-element array per row; raise the cap explicitly
    * if a larger boost is truly intended.
    */
  def resampleCopies(
      df: DataFrame,
      stratumCol: String,
      idCol: Column,
      ratePermille: Map[String, Int],
      defaultPermille: Int = 1000,
      bucketOf: Column => Column = avalancheBucket(_),
      capPermille: Int = 100000
  ): DataFrame = {
    // check the listed rates and the default separately: merging them into
    // one map keyed by stratum name would let a stratum literally named
    // like the sentinel shadow its real rate out of the check
    val over = ratePermille.toSeq.filter(_._2 > capPermille) ++
      (if (defaultPermille > capPermille) Seq("(default rate)" -> defaultPermille)
       else Nil)
    require(over.isEmpty,
      s"resampleCopies: rate(s) ${over.map { case (k, v) => s"$k=${v}permille" }
        .mkString(", ")} exceed capPermille=$capPermille (${capPermille / 1000}x); " +
        "each output row materializes rate/1000 array slots map-side - raise " +
        "capPermille explicitly if a larger boost is truly intended")
    val rate = ratePermille.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, permille)) =>
        when(col(stratumCol) === stratum, lit(permille)).otherwise(acc)
    }
    val withCopies = df
      .withColumn("bucket", bucketOf(idCol))
      .withColumn("rate", rate.cast("long"))
      .withColumn("n_copies",
        floor(col("rate").cast("double") / 1000.0).cast("long") +
          when(col("bucket") < pmod(col("rate"), lit(1000L)), 1L).otherwise(0L))
    withCopies
      .select(withCopies.columns.map(col) :+
        posexplode(array_repeat(lit(true), col("n_copies").cast("int"))): _*)
      .withColumnRenamed("pos", "copy_idx")
      .drop("col")
  }

  /** Stratified deterministic sampling: per-stratum keep-rate in permille
    * (`ratePermille`), rows of unlisted strata get `defaultPermille`. A row
    * is kept iff its `bucketOf(id)` < its stratum's rate, so the kept
    * fraction converges to rate/1000 per stratum while staying a pure
    * function of the id. `bucketOf` defaults to the full-avalanche
    * [[avalancheBucket]] (unbiased on ANY id structure); pass
    * [[mulHashBucket]] when a bit-exact SQL oracle must replay the
    * decision, accepting its small-arithmetic-stratum stripe caveat.
    * Returns the input columns plus `bucket`, the applied `rate`, and
    * `kept` (callers filter on `kept`; emitting the decision and the rate
    * keeps both branches auditable).
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: Column,
      ratePermille: Map[String, Int],
      defaultPermille: Int = 0,
      bucketOf: Column => Column = avalancheBucket(_)
  ): DataFrame = {
    val rate = ratePermille.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (stratum, permille)) =>
        when(col(stratumCol) === stratum, lit(permille)).otherwise(acc)
    }
    df.withColumn("bucket", bucketOf(idCol))
      .withColumn("rate", rate.cast("long"))
      .withColumn("kept", col("bucket") < col("rate"))
  }
}
