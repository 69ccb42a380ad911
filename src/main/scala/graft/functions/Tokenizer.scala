package graft.functions

import org.apache.spark.sql.Column

/** One interface over the engine's two production tokenizer families
  * (BPE, [[Bpe]]; unigram-LM, [[Unigram]]) so serialization-side
  * composition — sequence packing (q102/q125), token budgeting, and
  * training-shard id-encode (q105/q126) — is family-agnostic: the
  * composing operator needs the per-document token count or the id
  * render, and must not care how the model produced it. Both
  * implementations stay single codegen map passes with the model as a
  * plan constant; the trait adds no indirection at runtime (the Column
  * is built once at plan time).
  */
trait Tokenizer extends Serializable {

  /** Token count per document under this family's trained model. */
  def tokenCount(text: Column): Column

  /** `struct(n_tokens, n_oov, ids)` per document — the training-shard
    * serialization surface (int token ids, space-joined — the
    * cross-engine render), OOV counted under the family's recorded
    * story: BPE maps OOV to −1 (or byte-fallback ids, then `n_oov` stays
    * 0); unigram emits the reserved `|pieces|` id (`oov=unkid`, recorded
    * in the model artifact).
    */
  def encodeIds(text: Column): Column

  /** Family tag for logs/fixtures ("bpe", "unigram"). */
  def family: String
}

object Tokenizer {

  /** BPE family over a trained merge list ([[Bpe.encodeStats]]). The
    * vocabulary is only needed for [[Tokenizer.encodeIds]] — a
    * count-only consumer may omit it, and the id surface then fails
    * loudly instead of minting ids from a vocabulary that was never
    * persisted.
    */
  def bpe(
      merges: Seq[(String, String)],
      vocab: Seq[String] = Nil,
      byteFallback: Boolean = false): Tokenizer = new Tokenizer {
    override def tokenCount(text: Column): Column =
      Bpe.encodeStats(text, merges).getField("n_tokens")
    override def encodeIds(text: Column): Column = {
      require(vocab.nonEmpty,
        "BPE id-encode needs the persisted vocabulary — construct " +
          "Tokenizer.bpe(merges, vocab[, byteFallback])")
      Bpe.encodeIds(text, merges, vocab, byteFallback)
    }
    override def family: String = "bpe"
  }

  /** Unigram-LM family over a trained piece model
    * ([[Unigram.encodeStats]] / [[Unigram.encodeIds]] — the id
    * vocabulary is the model's canonical piece order, no second
    * artifact). */
  def unigram(model: Unigram.Model): Tokenizer = new Tokenizer {
    override def tokenCount(text: Column): Column =
      Unigram.encodeStats(text, model).getField("n_tokens")
    override def encodeIds(text: Column): Column =
      Unigram.encodeIds(text, model)
    override def family: String = "unigram"
  }
}
