package graft.functions

import org.apache.spark.sql.Column

/** One interface over the engine's two production tokenizer families
  * (BPE, [[Bpe]]; unigram-LM, [[Unigram]]) so serialization-side
  * composition — sequence packing (q102/q125), token budgeting — is
  * family-agnostic: the composing operator needs ONE statistic, the
  * per-document token count, and must not care how the model produced
  * it. Both implementations stay single codegen map passes with the
  * model as a plan constant; the trait adds no indirection at runtime
  * (the Column is built once at plan time).
  */
trait Tokenizer extends Serializable {

  /** Token count per document under this family's trained model. */
  def tokenCount(text: Column): Column

  /** Family tag for logs/fixtures ("bpe", "unigram"). */
  def family: String
}

object Tokenizer {

  /** BPE family over a trained merge list ([[Bpe.encodeStats]]). */
  def bpe(merges: Seq[(String, String)]): Tokenizer = new Tokenizer {
    override def tokenCount(text: Column): Column =
      Bpe.encodeStats(text, merges).getField("n_tokens")
    override def family: String = "bpe"
  }

  /** Unigram-LM family over a trained piece model
    * ([[Unigram.encodeStats]]). */
  def unigram(model: Unigram.Model): Tokenizer = new Tokenizer {
    override def tokenCount(text: Column): Column =
      Unigram.encodeStats(text, model).getField("n_tokens")
    override def family: String = "unigram"
  }
}
