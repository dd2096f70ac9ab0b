package graft.streaming

import graft.pipeline.Deid
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Structured Streaming front-end for the redaction pipeline.
  *
  * The reference is strictly batch (SURVEY §1.4) and the north rule asks for
  * batch + checkpoint-resume; this module is the additive streaming surface:
  * the same narrow `Deid.redact` transform applied to a file/Kafka stream,
  * with event-time windowed entity metrics under a watermark.
  */
object DeidStream {

  /** Streaming turns source from a parquet directory (schema = Turn). */
  def readTurns(spark: SparkSession, path: String): DataFrame =
    spark.readStream
      .schema("conv_id string, turn_idx int, role string, text string, " +
        "tool string, ts timestamp")
      .parquet(path)

  /** Redacted streaming frame — identical transform as batch. */
  def redact(turns: DataFrame, mode: String = "replace"): DataFrame =
    Deid.redact(turns, mode)

  /** Per-10-minute-window entity-type counts with a 1-hour watermark —
    * the streaming analogue of the G9 histogram.
    */
  def entityCountsByWindow(turns: DataFrame, mode: String = "replace"): DataFrame =
    turns
      .withWatermark("ts", "1 hour")
      .withColumn("r", graft.functions.gf.deid(col("text"), mode))
      .select(col("ts"), explode(col("r.entities")).as("e"))
      .groupBy(window(col("ts"), "10 minutes"), col("e.typ").as("typ"))
      .count()

  /** File-sink writer with checkpointing; `availableNow` processes the
    * backlog then stops (used by tests; production uses continuous micro-
    * batches with the same checkpoint dir).
    */
  def writer(
      redacted: DataFrame,
      outPath: String,
      checkpoint: String,
      availableNow: Boolean = true
  ): DataStreamWriter[Row] = {
    val w = redacted.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
    if (availableNow) w.trigger(Trigger.AvailableNow()) else w
  }

  /** Streaming exact dedup: first-seen doc per content hash survives,
    * late re-arrivals of the same text are dropped. State = Spark's own
    * `dropDuplicatesWithinWatermark` store keyed by the sha-256 of the
    * text — state is bounded by the watermark horizon (the batch twin,
    * [[graft.ops.Dedup.exact]], keeps min-id per hash; on a stream
    * "first-seen" is the arrival-order analogue of min-id).
    */
  def dedupExact(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  final case class TurnKey(conv_id: String, turn_idx: Int, text: String)
  final case class ConvSigState(fp: Long, fp2: Long, n: Long)
  final case class ConvSig(conv_id: String, fp: Long, fp2: Long, n_turns: Long)

  /** Streaming conversation multiset fingerprints — the streaming twin of
    * the `conv_dedup_fp` aggregation path: per conversation, state is ONE
    * (xor_lo, xor_hi, count) triple folded incrementally over arriving
    * turns (`fp ^= h; fp2 ^= xxhash64(h, tag)` with
    * `h = xxhash64(turn_idx, text)` — bit-exact with the batch
    * [[graft.ops.TextStats.multisetFingerprint128]] via the same XXH64
    * running hash, seed 42, int-then-UTF8 order, then the long-fold remix
    * `hashLong(tag, hashLong(h, 42))`; a null text contributes
    * `hashInt(turn_idx)` alone — Spark's XxHash64 skips null children, so
    * the stream matches the batch fingerprint instead of throwing), so a
    * 10⁹-turn mega-conversation costs 24 bytes of store state. Each
    * micro-batch that touches a conversation emits its CURRENT
    * `(conv_id, fp, fp2, n_turns)` — n_turns is monotone, so downstream
    * keeps the max-n row per conversation ("latest wins"). The dedup
    * DECISION is 128-bit (fp, fp2) equality downstream (the
    * `conv_dedup_fp` class key or
    * [[graft.ops.Dedup.conversationDupPairs]]' verify — false collisions
    * need both independent lanes, ~2⁻¹²⁸).
    *
    * State retention: with the default `closeAfter = "never"` the 24-byte
    * state is kept for every conversation ever seen — total state is
    * bounded by the number of DISTINCT conversations (not turns), the
    * honest bound for a corpus where conversations never formally close. A
    * finite `closeAfter` is a CORRECTNESS horizon, not mere memory tuning
    * (exactly a sessionization watermark's contract): it must exceed the
    * maximum idle gap within one conversation, because a conversation
    * resuming AFTER its state timed out restarts the fold from zero — the
    * resumed emission carries a partial-suffix fingerprint with a SMALLER
    * n_turns, which the max-n rule downstream would discard in favor of
    * the stale full-prefix row, silently mis-deduping that conversation.
    * Downstream can detect the violation (n_turns regressed for a
    * conv_id) and route the conversation to batch re-aggregation.
    *
    * Contract: `turn_idx` must be int32 (the input_hint schema) — xxhash64
    * of an int64 differs, so a long column would silently diverge from the
    * batch fingerprint; the cast below normalizes and the spec pins parity.
    */
  def conversationFingerprints(
      turns: DataFrame,
      closeAfter: String = "never"
  )(implicit spark: SparkSession): org.apache.spark.sql.Dataset[ConvSig] = {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.unsafe.types.UTF8String
    val useTimeout = closeAfter != "never"
    val timeout =
      if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    turns
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("text"))
      .as[TurnKey]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvSigState, ConvSig](
        OutputMode.Append(), timeout) {
        case (id, it, state) =>
          if (state.hasTimedOut) {
            // latest signature was already emitted when last touched; the
            // closeAfter contract (scaladoc) says the conversation is over,
            // so the 24-byte state can be reclaimed
            state.remove()
            Iterator.empty
          } else {
            var s = state.getOption.getOrElse(ConvSigState(0L, 0L, 0L))
            it.foreach { t =>
              val base = XXH64.hashInt(t.turn_idx, 42L)
              val h =
                if (t.text == null) base // XxHash64 skips null children
                else XXH64.hashUTF8String(UTF8String.fromString(t.text), base)
              // second lane: xxhash64(h, tag) = left-to-right long fold
              // hashLong(tag, hashLong(h, seed)) — bit-exact with the
              // batch multisetFingerprint128 remix
              val h2 = XXH64.hashLong(
                graft.ops.TextStats.MultisetFp128Tag, XXH64.hashLong(h, 42L))
              s = ConvSigState(s.fp ^ h, s.fp2 ^ h2, s.n + 1)
            }
            state.update(s)
            if (useTimeout) state.setTimeoutDuration(closeAfter)
            Iterator.single(ConvSig(id, s.fp, s.fp2, s.n))
          }
      }
  }

  final case class CtxTurn(conv_id: String, turn_idx: Int, role: String, text: String)
  final case class CtxState(recent: List[(Int, String, String)])
  final case class CtxPair(conv_id: String, turn_idx: Int, context: String, target: String)

  /** Streaming SFT context assembly — the streaming twin of
    * [[graft.ops.Conversations.contextPairs]] (VERDICT r6 #9): per
    * conversation the state is the last `nContext` turns (a bounded ring —
    * the same n-row bound the batch operator's `rowsBetween(-n, -1)` frame
    * guarantees, so a 10⁹-turn mega-conversation costs `nContext` rows of
    * store state), and every arriving `targetRole` turn emits its
    * (context, target) pair.
    *
    * Rendering is byte-identical with the batch side: element =
    * `concat_ws(": ", role, text)` (null-skipping — a null text renders
    * the role alone, a null role renders the text alone), context =
    * elements joined by `\n`, empty frame → empty string.
    *
    * Ordering contract: turns of one conversation must arrive turn_idx-
    * ascending ACROSS micro-batches (the append-only transcript-tail
    * shape; the batch twin sorts globally so it has no such horizon) —
    * within a batch the group's slice is sorted here, so intra-batch
    * disorder is absorbed. A turn arriving after a later turn was already
    * processed in a PREVIOUS batch would assemble a stale context; like
    * the sessionize watermark and the fingerprint `closeAfter`, that
    * horizon is a correctness contract, detectable downstream as
    * non-monotone turn_idx per conv_id. The intra-batch sort does mean
    * TRANSIENT memory of one conversation's slice of one micro-batch
    * (unlike the O(1) fingerprint fold above) — the STORE state stays
    * bounded at nContext rows; cap trigger size if a backfill can deliver
    * a whole mega-conversation in one batch.
    */
  def contextPairsStream(
      turns: DataFrame,
      nContext: Int = 3,
      targetRole: String = "assistant"
  )(implicit spark: SparkSession): org.apache.spark.sql.Dataset[CtxPair] = {
    require(nContext >= 1, s"nContext must be >= 1, got $nContext")
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    turns
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("role"), col("text"))
      .as[CtxTurn]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[CtxState, CtxPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (id, it, state) =>
          var recent = state.getOption.map(_.recent).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer.empty[CtxPair]
          // the batch twin orders by turn_idx globally; sort this batch's
          // slice so intra-batch arrival order cannot change the output
          it.toSeq.sortBy(_.turn_idx).foreach { t =>
            if (t.role == targetRole) {
              val ctx = recent.map { case (_, r, x) =>
                if (r == null && x == null) ""
                else if (r == null) x
                else if (x == null) r
                else r + ": " + x
              }.mkString("\n")
              out += CtxPair(id, t.turn_idx, ctx, t.text)
            }
            recent = (recent :+ ((t.turn_idx, t.role, t.text))).takeRight(nContext)
          }
          state.update(CtxState(recent))
          out.iterator
      }
  }

  /** Streaming benchmark decontamination — the same broadcast-digest
    * semi-join as [[graft.ops.Dedup.contaminatedSpans]], applied to each
    * micro-batch: the static reference (benchmark/eval) side reduces to
    * DISTINCT window digests and broadcasts, so the scrub is STATELESS
    * (stream-static left-semi join; no state store, no watermark needed)
    * and incremental ingest gets the same cut list as the batch scrub.
    * Emits the raw (doc_id, tok_start, tok_end, start, end) window spans;
    * island-merging is a per-doc window function, so run
    * [[graft.ops.Dedup.mergeTokenSpans]] downstream in `foreachBatch` (a
    * document arrives whole within one batch, so per-batch merging equals
    * the batch semantics — pinned by the StreamingSpec batch-twin test).
    */
  def decontaminateSpans(
      docs: DataFrame,
      reference: DataFrame,
      k: Int = 8
  ): DataFrame =
    graft.ops.Dedup.contaminatedSpans(docs, reference, k = k)
}
