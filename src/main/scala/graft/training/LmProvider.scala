package graft.training

import graft.ops.BpeTokenizer

/** The GPT-2 replacement-provider leaf
  * (`/root/reference/src/deid_pipeline/pii/utils/fake_provider.py:184-223`)
  * as a scaffold in the TokenScorer style: everything EXCEPT the forward
  * pass is real — the prompt template, tokenize/decode through the actual
  * byte-level BPE ([[BpeTokenizer]], testable against the reference's own
  * GPT-2 vocab artifacts), and the `"Replacement:"` post-processing split.
  * The transformer itself is behind [[LmProvider.CausalLm]] (no torch /
  * ONNX runtime ships in this sandbox; the reference gates the same way —
  * `_try_init_gpt2` disables the provider when transformers is absent).
  */
object LmProvider {

  /** HF `model.generate(..., do_sample=False)` contract: returns the FULL
    * sequence (prompt ids + up to `maxNewTokens` greedy continuations).
    */
  trait CausalLm extends Serializable {
    def generateGreedy(inputIds: Array[Int], maxNewTokens: Int): Array[Int]
  }

  /** No-model default: echoes the prompt (generation contributes nothing),
    * mirroring the reference's disabled-provider behavior.
    */
  object NoModel extends CausalLm {
    def generateGreedy(inputIds: Array[Int], maxNewTokens: Int): Array[Int] = inputIds
  }

  /** `_gpt2_generate` (fake_provider.py:202-223): prompt → generate →
    * decode → split on "Replacement:" (fallback: strip the prompt).
    * `max_length = len(prompt) + 20` ⇒ maxNewTokens = 20.
    */
  def gpt2Generate(
      entityType: String,
      original: String,
      tokenizer: BpeTokenizer,
      lm: CausalLm): String = {
    val prompt =
      s"Replace the following $entityType value with a fictional value that " +
        s"fits the context: '$original'.\nReplacement:"
    val ids = tokenizer.encode(prompt)
    val out = lm.generateGreedy(ids, 20)
    val generated = tokenizer.decode(out.toSeq)
    if (generated.contains("Replacement:"))
      generated.split("Replacement:", 2).last.trim
    else generated.replace(prompt, "").trim
  }
}
