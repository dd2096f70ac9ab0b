package graft

import graft.pipeline.{Deid, TurnsGen}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main (driver contract): runs headline queries on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Narrow pipelines are forced through the noop sink — `count()` would let
  * Catalyst eliminate the projection under measurement.
  */
object Bench {

  def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Host-capacity probe: pure-CPU mixing loop at 1 thread vs `threads`
    * threads → the parallel speedup this box actually sustains. Embedded in
    * the bench JSON so the scaling numbers carry their own context (this
    * shared VM throttles per-core above ~16 busy cores; an 8→32 efficiency
    * read without this number looks like an engine defect).
    */
  def hostProbe(threads: Int = 32): (Double, Double) = {
    def work(iters: Long): Long = {
      var x = 0x9e3779b97f4a7c15L
      var i = 0L
      while (i < iters) {
        x = x * 6364136223846793005L + 1442695040888963407L
        x ^= x >>> 33
        i += 1
      }
      x
    }
    work(20000000L) // JIT warmup
    val iters = 200000000L
    val t1 = System.nanoTime()
    val sink1 = work(iters)
    val singleSec = (System.nanoTime() - t1) / 1e9
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t2 = System.nanoTime()
    val futures = (1 to threads).map(_ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = work(iters)
      }))
    val sinkN = futures.map(_.get()).sum
    val multiSec = (System.nanoTime() - t2) / 1e9
    pool.shutdown()
    if (sink1 + sinkN == 42) println("") // keep the loops observable
    val singleMops = iters / singleSec / 1e6
    val speedup = (threads * iters / multiSec / 1e6) / singleMops
    (singleMops, speedup)
  }

  /** Cheap single-thread probe (~0.1 s): Mops the host sustains right now.
    * Sampled before and after the query block so a committed BENCH artifact
    * carries its own host-contention context — a run where `after` reads
    * far below `before` (or both read far below the ~440 Mops this VM
    * sustains unloaded) was taken during a throttle window and its query
    * times under-read the engine.
    */
  def quickProbe(): Double = {
    def work(iters: Long): Long = {
      var x = 0x9e3779b97f4a7c15L
      var i = 0L
      while (i < iters) {
        x = x * 6364136223846793005L + 1442695040888963407L
        x ^= x >>> 33
        i += 1
      }
      x
    }
    work(5000000L)
    val iters = 50000000L
    val t0 = System.nanoTime()
    val sink = work(iters)
    val sec = (System.nanoTime() - t0) / 1e9
    if (sink == 42) println("")
    iters / sec / 1e6
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the sf0.1 turns table is only ~45 MB: with the 128 MB default split
      // size the whole scan bin-packs into 1-2 partitions and the job runs
      // single-threaded. At real scale the defaults are right; for the
      // small-input bench the split must shrink so all cores get work.
      .config("spark.sql.files.maxPartitionBytes", (1 << 20).toString)
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val probeBefore = quickProbe()
    val qctx = scala.collection.mutable.LinkedHashMap.empty[String, QCtx]
    val (results, nTurns) = queryTimes(spark, sfDir, qctx)
    val probeAfter = quickProbe()
    val queryContextJson = qctx
      .map { case (k, c) => "\"" + k + "\":" + c.json }
      .mkString("{", ",", "}")

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    val turnsPerSec = nTurns / results("deid_replace")

    // whole-suite linearity evidence: the same query set at the next sf down
    // (10× less data) — per-query big/small time ratios ≪ 100 refute any
    // hidden quadratic term the single-sf numbers could hide
    val sfScaleJson = {
      val smallDir = "/root/testdata/sf0.01"
      val isBig = sfDir.endsWith("0.1")
      if (!isBig || !java.nio.file.Files.isDirectory(java.nio.file.Paths.get(smallDir)))
        "null"
      else {
        val (small, _) = queryTimes(spark, smallDir, probes = false)
        val ratios = results.collect {
          case (k, v) if small.contains(k) && small(k) > 0 =>
            "\"" + k + "\":" + f"${v / small(k)}%.2f"
        }.mkString("{", ",", "}")
        s"""{"small_sf":"$smallDir","data_ratio":10,"time_ratio_by_query":$ratios}"""
      }
    }

    val skewJson = skewEvidence(spark, sfDir)
    val keeperSkewJson = keeperSkewEvidence(spark, sfDir)
    val ckptJson = checkpointResumeEvidence(spark, sfDir)
    val windowJson = tokenWindowsProbe(spark, sfDir)
    val (ivfRecallJson, lshRecallJson, pqRecallJson) = annRecallProbes(spark, sfDir)
    spark.stop()

    val refHeadToHeadJson = refHeadToHead()

    // North-rule scaling evidence (BASELINE.md): identical job + input at
    // 2, 8, 32 cores, passes INTERLEAVED round-robin (2,8,32 × runs) so a
    // transient host-throttle burst hits all levels equally instead of
    // poisoning one level's whole block; best-of-runs per level.
    val scalingJson =
      if (sys.env.contains("SPARK_GRAFT_SKIP_SCALING")) "null"
      else {
        val (singleMops, hostSpeedup) = hostProbe(32)
        // replicate=4 (1.8M turns) lengthens each measured pass so transient
        // host-throttle bursts on this shared VM average out
        val levels = ScalingBench.measure(sfDir, Seq(2, 8, 32), replicate = 4, runs = 3)
        val byCpu = levels.map(l => l.cpus -> l).toMap
        val eff28 = byCpu(8).turnsPerSec / (4.0 * byCpu(2).turnsPerSec)
        val eff832 = byCpu(32).turnsPerSec / (4.0 * byCpu(8).turnsPerSec)
        val levelsJson = levels.map(l =>
          f"""{"cpus":${l.cpus},"sec":${l.sec}%.3f,"turns_per_sec":${l.turnsPerSec}%.0f}""")
          .mkString("[", ",", "]")
        f"""{"turns":${levels.head.turns},"levels":$levelsJson,"efficiency_2_to_8":$eff28%.3f,"efficiency_8_to_32":$eff832%.3f,"host_probe":{"threads":32,"single_thread_mops":$singleMops%.0f,"parallel_speedup_32":$hostSpeedup%.1f}}"""
      }

    val hostContext =
      f"""{"single_thread_mops_before_queries":$probeBefore%.0f,"single_thread_mops_after_queries":$probeAfter%.0f}"""
    // full line FIRST (humans read it in the session log) …
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","turns":$nTurns,"redaction_turns_per_sec":${f"$turnsPerSec%.0f"},"cpus":$cpus,"host_context":$hostContext,"query_context":$queryContextJson,"skew":$skewJson,"keeper_skew":$keeperSkewJson,"sf_scale":$sfScaleJson,"checkpoint_resume":$ckptJson,"token_windows":$windowJson,"ivf_recall":$ivfRecallJson,"lsh_recall":$lshRecallJson,"pq_recall":$pqRecallJson,"ref_head_to_head":$refHeadToHeadJson,"scaling":$scalingJson}""")
    // … compact line LAST: the driver keeps only a ~2,000-char stdout TAIL,
    // and round 6's full line outgrew it — the committed artifact lost its
    // per-query map (VERDICT r6 #2). The tail-surviving line carries the
    // headline, the full per-query map, and the scaling/skew/recall/h2h
    // verdict numbers, dropping only the bulky per-run context blocks.
    val h2hRatio = """"wall_ratio_p95":([0-9.]+|null)""".r
      .findFirstMatchIn(refHeadToHeadJson).map(_.group(1)).getOrElse("null")
    val enginePerQuery = """"p95_ms":([0-9.]+)""".r
      .findFirstMatchIn(refHeadToHeadJson).map(_.group(1)).getOrElse("null")
    val effs = """"efficiency_2_to_8":([0-9.]+).*"efficiency_8_to_32":([0-9.]+)""".r
      .findFirstMatchIn(scalingJson)
    val scalingCompact = effs
      .map(m => s"""{"efficiency_2_to_8":${m.group(1)},"efficiency_8_to_32":${m.group(2)}}""")
      .getOrElse("null")
    val skewRatio = """"max_over_median":([0-9.]+)""".r
    val skewCompact = {
      val rs = skewRatio.findAllMatchIn(skewJson).map(_.group(1)).toSeq
      if (rs.size >= 2) s"""{"unsalted_max_over_median":${rs(0)},"salted_max_over_median":${rs(1)}}"""
      else "null"
    }
    val keeperCompact = {
      val rs = skewRatio.findAllMatchIn(keeperSkewJson).map(_.group(1)).toSeq
      if (rs.size >= 3) s"""{"window_max_over_median":${rs(0)},"agg_join_skew_split":${rs(1)},"agg_join_default":${rs(2)}}"""
      else "null"
    }
    // the 3 worst big/small time ratios — the r6 watch-item readout
    // (≥10× at 10× data twice in a row ⇒ profile, not host noise)
    val sfScaleTop = {
      val rs = """"([a-z0-9_]+)":([0-9.]+)""".r.findAllMatchIn(
        """"time_ratio_by_query":\{([^}]*)\}""".r.findFirstMatchIn(sfScaleJson)
          .map(_.group(1)).getOrElse(""))
        .map(m => m.group(1) -> m.group(2).toDouble).toSeq
      if (rs.isEmpty) "null"
      else rs.sortBy(-_._2).take(3)
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }
        .mkString("{", ",", "}")
    }
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","turns":$nTurns,"redaction_turns_per_sec":${f"$turnsPerSec%.0f"},"cpus":$cpus,"skew":$skewCompact,"keeper_skew":$keeperCompact,"checkpoint_resume":$ckptJson,"ivf_recall":${ivfRecallJson.replaceAll(""","note":"[^"]*"""", "")},"lsh_recall":$lshRecallJson,"pq_recall":$pqRecallJson,"sf_scale_top3":$sfScaleTop,"ref_h2h_p95_ms":$enginePerQuery,"ref_h2h_wall_ratio_p95":$h2hRatio,"scaling":$scalingCompact}""")
  }

  /** Measured ANN recall probes (VERDICT r5 #5 / r6 #4), sharing ONE
    * brute-force pass over the fixed query set (vec_id < 20):
    *
    *  - IVF: the full recall-vs-nprobe curve (1..16; nprobe=16 probes all
    *    lists and must read 1.0 — the exact-regime pin), trained with the
    *    best swept config (maximin init + 8 Lloyd rounds). This corpus is
    *    near-unclusterable (synthetic embeddings, no macro cluster
    *    structure), so recall tracks the probed fraction — the curve
    *    commits that as a measured fact;
    *  - LSH general regime: recall@5 of the auto-bit-width banded sign-LSH
    *    top-k;
    *  - PQ (memory path, 32× compression at 8×16×8): ADC-only recall@5 and
    *    the production fetch-and-rerank recall@5 (top-50 ADC candidates
    *    re-ranked by exact cosine — raw vectors touched only for
    *    candidates).
    *
    * All deterministic (seeded sample/hyperplanes/codebooks, fixed
    * queries) — reproducible constants per fixture; OpsSpec asserts the
    * floors so a regression fails a test, not just a bench read.
    */
  private def annRecallProbes(spark: SparkSession, sfDir: String): (String, String, String) = {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nHint = emb.count() // bench-side count, not a library hidden job
    val queries = emb.where(col("vec_id") < 20)
    def topkSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val brute = topkSet(graft.ops.Similarity.bruteForceTopK(emb, queries, k = 5))
    def recallOf(got: Map[Long, Set[Long]]): Double =
      brute.map { case (q, want) =>
        got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
      }.sum / brute.size

    val centroids = graft.ops.Ivf.train(emb, k = 16, iters = 8,
      sampleCap = 4096, init = "maximin")
    val curve = Seq(1, 2, 4, 8, 16).map { nprobe =>
      val r = recallOf(topkSet(
        graft.ops.Ivf.topK(emb, queries, centroids, k = 5, nprobe = nprobe)))
      f""""nprobe_$nprobe":$r%.3f"""
    }
    val ivfJson =
      s"""{"k":5,"n_queries":${brute.size},"init":"maximin","lloyd_iters":8,${curve.mkString(",")},"note":"corpus near-unclusterable: recall ~ probed fraction"}"""

    val lshR = recallOf(topkSet(
      graft.ops.Similarity.lshTopK(emb, k = 5, nHint = nHint)
        .where(col("q_id") < 20)))
    val lshJson = f"""{"k":5,"n_queries":${brute.size},"recall_at_5":$lshR%.3f}"""

    // 8 subspaces × 256 centroids = the standard PQ 8×8-bit geometry:
    // 8 B/vec (32× on 64-dim float), the memory-path operating point
    val cbs = graft.ops.Pq.trainCodebooks(emb, nsub = 8, ncent = 256,
      subDim = 8, iters = 8, sampleCap = 2048)
    val pqAdc = recallOf(topkSet(graft.ops.Pq.topK(emb, queries, cbs, k = 5)))
    val pqRr = recallOf(topkSet(
      graft.ops.Pq.topK(emb, queries, cbs, k = 5, rerankFrom = 50)))
    // the production composition: trained coarse pruning (4 of 16 lists =
    // ~25% of the corpus scanned) over the same trained PQ codes
    val coarse = graft.ops.Pq.trainCoarse(emb, ncoarse = 16)
    val ivfpq = recallOf(topkSet(
      graft.ops.Pq.ivfPqTopK(emb, queries, coarse, cbs, k = 5, nprobe = 4)))
    val pqJson =
      f"""{"k":5,"n_queries":${brute.size},"nsub":8,"ncent":256,"bytes_per_vec":8,"compression_x":32,"recall_at_5_adc":$pqAdc%.3f,"recall_at_5_rerank50":$pqRr%.3f,"ivfpq_nprobe4_recall_at_5":$ivfpq%.3f}"""
    (ivfJson, lshJson, pqJson)
  }

  /** Fresh per-round head-to-head on the reference's own protocol (VERDICT
    * r5 #4): engine side inline ([[graft.tools.RefBench.measure]]), reference
    * side via `tools/run_ref_bench.py` (the reference's benchmark_pipeline
    * semantics run in-place, deps stubbed as in the golden env). `null` with
    * a reason when the reference side cannot run here (e.g. python absent).
    */
  private def refHeadToHead(): String = {
    val (p50, p95, mean, entities) = graft.tools.RefBench.measure(20)
    val engine =
      f""""engine":{"p50_ms":$p50%.3f,"p95_ms":$p95%.3f,"mean_ms":$mean%.3f,"entities":$entities}"""
    val ref = try {
      val script = new java.io.File("tools/run_ref_bench.py")
      if (!script.exists) "null"
      else {
        // stdout to a file and stderr discarded: piping either and reading
        // after waitFor can deadlock once the child fills the ~64 KB pipe
        // buffer (stderr chatter from the stubbed imports would do it), and
        // a bounded waitFor keeps a wedged child from hanging the bench
        val outFile = java.io.File.createTempFile("graft_ref_bench", ".out")
        val pb = new ProcessBuilder("python3", script.getPath, "20")
        pb.redirectOutput(outFile)
        pb.redirectError(ProcessBuilder.Redirect.DISCARD)
        val p = pb.start()
        val done = p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS)
        val res =
          if (!done) { p.destroyForcibly(); "null" }
          else {
            val out = new String(java.nio.file.Files.readAllBytes(outFile.toPath),
              java.nio.charset.StandardCharsets.UTF_8).trim
            val lastLine = out.linesIterator.toSeq.lastOption.getOrElse("")
            if (p.exitValue() == 0 && lastLine.startsWith("{")) lastLine else "null"
          }
        outFile.delete()
        res
      }
    } catch { case _: Exception => "null" }
    val ratio =
      if (ref == "null") "null"
      else {
        val m = """"p95_ms":\s*([0-9.]+)""".r.findFirstMatchIn(ref)
        m.map(x => f"${p95 / x.group(1).toDouble}%.3f").getOrElse("null")
      }
    s"""{$engine,"reference":$ref,"wall_ratio_p95":$ratio,"protocol":"benchmark_pipeline 10k-char zh, warmup, 20 runs; asymmetry: engine times process() on an in-memory string, reference times its own file-path entry (per-run read + input handling) - ratio slightly flatters the engine"}"""
  }

  /** Is the window-dedup path compute-bound (TokenWindowsExpr scan) or
    * shuffle-bound (digest groupBy + join-back)? Times the expression-only
    * scan against the full duplicatedWindowSpans+merge over the whole
    * documents table, best-of-3 each — the r4 question of whether promoting
    * the window scan further would pay. scan_share ≈ 1 ⇒ compute-bound
    * (promote); scan_share ≪ 1 ⇒ shuffle-bound (no code change wins).
    */
  private def tokenWindowsProbe(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    def best3(f: => Unit): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache(); dt
    }.min
    val scan = best3(force(d.select(col("doc_id"),
      explode(graft.functions.gf.tokenWindows(col("text"), 8)).as("w"))))
    val full = best3 {
      val spans = graft.ops.Dedup.duplicatedWindowSpans(d, k = 8)
      force(graft.ops.Dedup.mergeTokenSpans(spans))
      spans.unpersist()
    }
    val share = if (full > 0) scan / full else 0.0
    val bound = if (share >= 0.6) "compute" else "shuffle"
    f"""{"scan_sec":$scan%.3f,"full_sec":$full%.3f,"scan_share":$share%.2f,"bound":"$bound"}"""
  }

  /** Resume evidence: a full CheckpointedRun over the benched turns, then
    * the same invocation again — the resume must skip every bucket (lineage
    * no-op) and cost ~nothing relative to the first run.
    */
  private def checkpointResumeEvidence(spark: SparkSession, sfDir: String): String = {
    val turnsPath = s"/tmp/graft_bench_turns_${sfDir.replaceAll("[^0-9.]", "")}"
    val out = s"/tmp/graft_bench_ckpt_${sfDir.replaceAll("[^0-9.]", "")}"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val redacted = Deid.redact(spark.read.parquet(turnsPath))
    val t0 = System.nanoTime()
    val s1 = graft.plans.CheckpointedRun.run(spark, redacted, out, sfDir, "bench-rules", 64)
    val firstSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val s2 = graft.plans.CheckpointedRun.run(spark, redacted, out, sfDir, "bench-rules", 64)
    val resumeSec = (System.nanoTime() - t1) / 1e9
    f"""{"buckets":64,"first_sec":$firstSec%.3f,"first_processed":${s1.processed},"resume_sec":$resumeSec%.3f,"resume_skipped":${s2.skipped}}"""
  }

  /** Per-query measurement context — makes the committed artifact
    * SELF-ATTRIBUTING (VERDICT r5 #1): each run of each query records its
    * wall-clock start and a ~0.1 s single-thread host probe taken
    * immediately before it, so a throttled host minute is attributable to a
    * specific query from the BENCH JSON alone (r5's knn_lsh 2.1× read could
    * not be told apart from a regression without this).
    */
  private final class QCtx {
    val probeMops = scala.collection.mutable.ArrayBuffer.empty[Double]
    val startEpoch = scala.collection.mutable.ArrayBuffer.empty[Double]
    val runsSec = scala.collection.mutable.ArrayBuffer.empty[Double]
    def json: String = {
      def arr(xs: Seq[Double], fmt: String) =
        xs.map(x => fmt.format(x)).mkString("[", ",", "]")
      s"""{"probe_mops":${arr(probeMops.toSeq, "%.0f")},"start_epoch":${arr(startEpoch.toSeq, "%.1f")},"runs_sec":${arr(runsSec.toSeq, "%.3f")}}"""
    }
  }

  /** Best-of-N per query over materialized parquet inputs for one sf dir;
    * the heavy dedup/ANN family runs INTERLEAVED round-robin (like the
    * scaling passes) so one throttled host minute degrades one run of every
    * query instead of poisoning one query's whole best-of window.
    */
  private def queryTimes(
      spark: SparkSession,
      sfDir: String,
      ctx: scala.collection.mutable.LinkedHashMap[String, QCtx] =
        scala.collection.mutable.LinkedHashMap.empty,
      probes: Boolean = true
  ): (scala.collection.mutable.LinkedHashMap[String, Double], Long) = {
    import org.apache.spark.sql.functions._

    // materialize the synthetic turns once so every benched query reads the
    // same on-disk parquet (and the generator's cross-join isn't re-timed);
    // 64+ splits so local[32] parallelizes the scan
    val turnsPath = s"/tmp/graft_bench_turns_${sfDir.replaceAll("[^0-9.]", "")}"
    TurnsGen.turns(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(turnsPath)
    val turns = spark.read.parquet(turnsPath)
    val nTurns = turns.count()

    // best-of-N per query: a single-shot number on this shared, throttling
    // VM is whatever the host was doing that minute (round-1 headline read
    // 28.5 s for a transform its own scaling section ran at 2.0 s). Each
    // run carries its own probe + timestamp in the ctx block.
    def onePass(name: String)(f: => Unit): Unit = {
      val c = ctx.getOrElseUpdate(name, new QCtx)
      // the ~0.1 s probe spin only pays off when the caller keeps the ctx
      // (the headline pass); the sf-scale pass passes probes=false
      if (probes) c.probeMops += quickProbe()
      c.startEpoch += System.currentTimeMillis() / 1000.0
      val t0 = System.nanoTime()
      f
      c.runsSec += (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop per-run persists (minhash/knn LSH)
    }
    def timed(name: String, runs: Int = 3)(f: => Unit): Double = {
      (1 to runs).foreach(_ => onePass(name)(f))
      ctx(name).runsSec.min
    }

    // warmup (JIT + codegen caches)
    force(Deid.redact(turns.limit(5000)))

    // detect/html are benched over the SAME materialized parquet as the
    // redaction queries — SparkEntry's versions re-derive turns through the
    // synthetic generator's cross-join (and the sort's range-sampling pass
    // runs that generator twice), which times the fixture generator, not
    // the engine
    val detectQ = turns
      .select(col("conv_id"), col("turn_idx"),
        explode(graft.functions.gf.regexDetect(col("text"))).as("e"))
      .select(col("conv_id"), col("turn_idx"), col("e.start"), col("e.end"),
        col("e.typ"), col("e.source"))
      .orderBy("conv_id", "turn_idx", "start", "typ")
    val htmlQ = turns.where(col("text").contains("<html"))
      .select(col("conv_id"), col("turn_idx"),
        graft.functions.gf.htmlText(col("text")).as("stripped"))
      .orderBy("conv_id", "turn_idx")

    val modelQ = graft.detect.ModelDetector.detectTurns(turns,
      graft.detect.ModelDetector.HeuristicScorer)(spark)
      .select(col("conv_id"), size(col("model_entities")).as("n"))
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
    val csvQ = docsDf.select(col("doc_id"),
      graft.functions.gf.csvDeid(
        concat(lit("id,phone,note\r\nA123456789,0912-345-678,\"row "),
          col("doc_id"), lit(" ok\"\r\n"))).getField("n_entities").as("n"))
    val pdfQ = docsDf.select(col("doc_id"),
      graft.functions.gf.pdfRedact(graft.functions.gf.pdfSynth(
        substring(regexp_replace(col("text"), "[^\\x20-\\x7e]", ""), 1, 200)))
        .getField("n_rects").as("n"))

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // best-of-5 for the headline pair: the turns/s record derives from
    // deid_replace, and on this shared VM one throttled minute inside a
    // best-of-3 window has twice produced a phantom ~2x "regression"
    results("deid_replace") = timed("deid_replace", runs = 5)(force(Deid.redact(turns)))
    results("deid_blackbox") = timed("deid_blackbox", runs = 5)(
      force(Deid.redact(turns, mode = "blackbox")))
    results("detect_entities") = timed("detect_entities")(force(detectQ))
    results("html_text_strip") = timed("html_text_strip")(force(htmlQ))
    results("model_detect") = timed("model_detect")(force(modelQ))
    results("csv_rewrite") = timed("csv_rewrite")(force(csvQ))
    results("pdf_redact") = timed("pdf_redact")(force(pdfQ))
    results("pdf_rewrite") = timed("pdf_rewrite")(force(docsDf.select(col("doc_id"),
      graft.functions.gf.pdfRewrite(graft.functions.gf.pdfSynth(
        substring(regexp_replace(col("text"), "[^\\x20-\\x7e]", ""), 1, 200)))
        .getField("n_rects").as("n"))))

    // heavy dedup/ANN family: INTERLEAVED round-robin passes (VERDICT r5 —
    // the fixed late-block order confounded position effects with real
    // regressions when the host throttled mid-block); min across rounds per
    // query, with a probe + timestamp attached to every individual pass
    val heavy: Seq[(String, () => Unit)] = Seq(
      "dedup_substring_merged", "dedup_keepers", "semantic_dedup_pairs",
      "dedup_minhash_pairs", "dedup_simhash_pairs", "knn_lsh"
    ).map(name => name -> (() => force(SparkEntry.queries(name)(spark, sfDir))))
    (1 to 3).foreach { _ =>
      heavy.foreach { case (name, f) => onePass(name)(f()) }
    }
    heavy.foreach { case (name, _) => results(name) = ctx(name).runsSec.min }

    results("pack_sequences") = timed("pack_sequences")(
      force(SparkEntry.queries("pack_sequences")(spark, sfDir)))
    results("word_freq_top50") = timed("word_freq_top50")(
      force(SparkEntry.queries("word_freq_top50")(spark, sfDir)))
    results("percentile_exact") = timed("percentile_exact")(
      force(SparkEntry.queries("percentile_exact")(spark, sfDir)))
    results("sessionize") = timed("sessionize")(
      force(SparkEntry.queries("sessionize")(spark, sfDir)))
    // round-6 corpus-pipeline additions; ccnet runs over the SAME
    // materialized turns parquet (SparkEntry's version re-derives turns
    // through the generator cross-join, which would time the fixture)
    results("turn_dedup_ccnet") = timed("turn_dedup_ccnet")(force(
      graft.ops.Dedup.ccnetDedup(turns.select("conv_id", "turn_idx", "text"),
        Seq("conv_id" -> col("conv_id"), "turn_idx" -> col("turn_idx")))))
    results("lm_quality_buckets") = timed("lm_quality_buckets")(
      force(SparkEntry.queries("lm_quality_buckets")(spark, sfDir)))
    results("repetition_filter") = timed("repetition_filter")(
      force(SparkEntry.queries("repetition_filter")(spark, sfDir)))
    results("repetition_filter_full") = timed("repetition_filter_full")(
      force(SparkEntry.queries("repetition_filter_full")(spark, sfDir)))
    // the five-gate composed pipeline decision — the end-to-end cost a
    // corpus build pays per document batch
    results("corpus_build_decision") = timed("corpus_build_decision")(
      force(SparkEntry.queries("corpus_build_decision")(spark, sfDir)))
    // SFT context assembly over the materialized turns (bounded frame)
    results("sft_context_pairs") = timed("sft_context_pairs")(force(
      graft.ops.Conversations.contextPairs(turns, nContext = 3)))
    results("decontamination_scrub") = timed("decontamination_scrub")(
      force(SparkEntry.queries("decontamination_scrub")(spark, sfDir)))
    // round-7 C4-family additions: two zero-shuffle scan-stage filters
    // (line-cleaning battery, hashed linear classifier) and the
    // three-sentence-span corpus dedup (digest min-agg + join-back)
    results("c4_filter") = timed("c4_filter")(
      force(SparkEntry.queries("c4_filter")(spark, sfDir)))
    results("hashed_quality") = timed("hashed_quality")(
      force(SparkEntry.queries("hashed_quality")(spark, sfDir)))
    results("sentence_span_dedup") = timed("sentence_span_dedup")(
      force(SparkEntry.queries("sentence_span_dedup")(spark, sfDir)))
    // PQ ADC top-k (memory-path ANN; fixed codebook = the oracle config)
    results("knn_pq") = timed("knn_pq")(
      force(SparkEntry.queries("knn_pq")(spark, sfDir)))
    // sparse lexical retrieval: corpus-side tf/dl shuffles + broadcast
    // query joins (the BM25 half of hybrid search)
    results("bm25_topk") = timed("bm25_topk")(
      force(SparkEntry.queries("bm25_topk")(spark, sfDir)))
    // fourth-half additions: DSIR scoring (two bounded-key histogram aggs +
    // one (id,bucket) shuffle + in-row fold) and URL keeper dedup
    // (scan-stage canonicalization + agg/join-back)
    results("dsir_importance") = timed("dsir_importance")(
      force(SparkEntry.queries("dsir_importance")(spark, sfDir)))
    results("url_dedup") = timed("url_dedup")(
      force(SparkEntry.queries("url_dedup")(spark, sfDir)))
    // exact per-domain cap (grouped counting bisection — pass-bound at
    // bench scale) and the composed crawl-curation decision
    results("domain_cap_exact") = timed("domain_cap_exact")(
      force(SparkEntry.queries("domain_cap_exact")(spark, sfDir)))
    results("crawl_curation_pipeline") = timed("crawl_curation_pipeline")(
      force(SparkEntry.queries("crawl_curation_pipeline")(spark, sfDir)))
    (results, nTurns)
  }

  /** Task-time distribution of the LAST stage of `f` (max/median over the
    * final stage's tasks) — the straggler readout shared by the write-skew
    * and keeper-skew blocks.
    */
  private def taskStats(spark: SparkSession)(f: => Unit): String = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        buf.synchronized { buf += ((t.stageId, t.taskInfo.duration)) }
    }
    spark.sparkContext.addSparkListener(listener)
    try f finally {
      org.apache.spark.sql.graftshim.Bridge.waitListeners(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
    }
    val all = buf.synchronized(buf.toVector)
    // the stage of interest (shuffle-read side of the clustering / the
    // keeper join-probe) is the last one
    val last = all.map(_._1).max
    val ts = all.filter(_._1 == last).map(_._2.toDouble).sorted
    val median = ts(ts.length / 2)
    val max = ts.last
    f"""{"n_tasks":${ts.length},"median_ms":$median%.0f,"max_ms":$max%.0f,"max_over_median":${max / math.max(median, 1.0)}%.2f}"""
  }

  /** Keeper-form straggler evidence (VERDICT r6 #1): a planted hot-class
    * corpus — 60% of docs share ONE text, replicated ×32 so the hot class
    * is big enough for task time to dominate scheduling overhead — run
    * through (a) the OLD `Window.partitionBy(class-key)` keeper shape
    * (inlined here; the library no longer ships it) and (b) the shipped
    * [[graft.ops.Dedup.exact]] agg-and-join-back shape, final-stage task
    * max/median each. The window funnels the hot class into one sorting
    * task regardless of config; the agg form's hot probe partition is a
    * stateless lookup AQE's skew-join splits (measured with the broadcast
    * path disabled and skew thresholds scaled to bench data volume —
    * production defaults, bench-scale bytes), and with broadcast allowed
    * the probe never key-shuffles at all.
    */
  private def keeperSkewEvidence(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    val p = s"/tmp/graft_hotclass_docs_${sfDir.replaceAll("[^0-9.]", "")}"
    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    // replicate to ~2M rows regardless of sf (rep reaches 4000 at the
    // 500-doc fixtures) so the hot class's single-task sort dominates the
    // ~50-100 ms fixed per-task overhead (at 160k rows the straggler hides
    // inside scheduling noise and both shapes read ~1×); sequence() keeps
    // the plan constant-size where an array of rep literals would not
    val rep = math.max(1L, 2000000L / math.max(1L, base.count())).toInt
    base
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(rep - 1))).as("rep"))
      .select((col("doc_id") * rep + col("rep")).as("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 6,
          lit("the planted hot boilerplate class every crawl snapshot carries"))
          .otherwise(col("text")).as("text"))
      .repartition(64)
      .write.mode("overwrite").parquet(p)
    val hot = spark.read.parquet(p)

    val windowForm = {
      import org.apache.spark.sql.expressions.Window
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try taskStats(spark)(force(
        hot.withColumn("dup_key", sha2(col("text"), 256))
          .withColumn("keeper_id",
            min(col("doc_id")).over(Window.partitionBy(col("dup_key"))))
          .select(col("doc_id"), col("keeper_id"),
            (col("doc_id") =!= col("keeper_id")).as("is_dup"))))
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // shuffled join-back: broadcast off, AQE skew-join thresholds scaled to
    // bench-size bytes (defaults are 256 MB / factor 5 — right at production
    // partition sizes, unreachable with a ~MB bench input)
    val aggJoin = {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16384")
      try taskStats(spark)(force(graft.ops.Dedup.exact(hot)))
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.coalescePartitions.minPartitionSize")
      }
    }
    // default config: the one-row-per-class build side broadcasts and the
    // probe never leaves its input partitioning
    val aggBcast = taskStats(spark)(force(graft.ops.Dedup.exact(hot)))
    s"""{"hot_class_share":0.6,"window_form":$windowForm,"agg_join_skew_split":$aggJoin,"agg_join_default":$aggBcast}"""
  }

  /** Straggler evidence: redact+cluster+write a power-law-skewed turns table
    * (one conversation holds ~30% of rows) with and without the salted
    * clustering, reporting final-stage task-time max/median. The salt bounds
    * the straggler; clustering on bare conv_id pins the mega-conversation to
    * ONE writer task.
    */
  private def skewEvidence(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    val p = s"/tmp/graft_skew_turns_${sfDir.replaceAll("[^0-9.]", "")}"
    TurnsGen.skewedTurns(spark, sfDir).repartition(64)
      .write.mode("overwrite").parquet(p)
    val sk = spark.read.parquet(p)
    // AQE coalescing merges the small non-mega partitions up to the same
    // size as the mega one at bench scale, masking the straggler this block
    // exists to demonstrate; at production scale partitions exceed the
    // coalesce target and the straggler is real — measure without AQE.
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    try {
      val unsalted = taskStats(spark)(force(
        Deid.redact(sk).repartition(col("conv_id"))
          .sortWithinPartitions("conv_id", "turn_idx")))
      val salted = taskStats(spark)(force(Deid.clusterForWrite(Deid.redact(sk))))
      s"""{"unsalted":$unsalted,"salted":$salted}"""
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
