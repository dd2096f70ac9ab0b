package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation-transcript assembly operators — the steps that turn a raw
  * (conv_id, turn_idx, role, text) turn table into training examples.
  */
object Conversations {

  /** SFT context-assembly: for every turn of `targetRole` (default
    * "assistant"), emit the example (`context` = the previous up-to-
    * `nContext` turns rendered as "role: text" lines, `target` = the
    * turn's text) — the instruction-tuning pair construction a transcript
    * corpus feeds to training.
    *
    * The window frame is BOUNDED (`rowsBetween(-nContext, -1)`), so
    * per-task state is `nContext` rows regardless of conversation length —
    * mega-conversation-safe, unlike a whole-conversation `collect_list`
    * roll-up. One shuffle on `conv_id` (the partition key the pipeline
    * already clusters by), sort within partition on `turn_idx`.
    *
    * String assembly is pure concatenation (`concat_ws` — skips null
    * texts, same as the SQL oracle's `concat_ws`), so a DuckDB window
    * `list(...) OVER (... ROWS BETWEEN n PRECEDING AND 1 PRECEDING)`
    * replays it byte-for-byte; a target turn with NO preceding rows gets
    * the empty-string context (the oracle coalesces DuckDB's NULL-for-
    * empty `array_to_string`).
    */
  def contextPairs(
      turns: DataFrame,
      nContext: Int = 3,
      targetRole: String = "assistant"
  ): DataFrame = {
    require(nContext >= 1, s"nContext must be >= 1, got $nContext")
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      .rowsBetween(-nContext, -1)
    turns
      .withColumn("context", concat_ws("\n",
        collect_list(concat_ws(": ", col("role"), col("text"))).over(w)))
      .where(col("role") === targetRole)
      .select(col("conv_id"), col("turn_idx"), col("context"),
        col("text").as("target"))
  }
}
