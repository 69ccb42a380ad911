package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The family-agnostic tokenizer interface: both families' counts match
  * their direct encodeStats call, and the shared packer produces
  * identical windows through the trait as through the hand-wired column.
  */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "aa bb aa bb cc"),
    (1L, "aa aa aa"),
    (2L, "bb cc dd ee ff gg")).toDF("doc_id", "text")

  test("both families count through the trait exactly as through encodeStats") {
    val merges = Bpe.learnMerges(docs, "text", numMerges = 4)
    val uni = Unigram.trainFromDictionary(Seq(("aa", 5L), ("bb", 3L), ("cc", 2L)))
    val viaTrait = docs.select(
      col("doc_id"),
      Tokenizer.bpe(merges).tokenCount(col("text")).as("nb"),
      Tokenizer.unigram(uni).tokenCount(col("text")).as("nu"))
    val direct = docs.select(
      col("doc_id"),
      Bpe.encodeStats(col("text"), merges).getField("n_tokens").as("nb"),
      Unigram.encodeStats(col("text"), uni).getField("n_tokens").as("nu"))
    assert(viaTrait.collect().toSeq.sortBy(_.getLong(0)) ==
      direct.collect().toSeq.sortBy(_.getLong(0)))
    assert(Tokenizer.bpe(merges).family == "bpe")
    assert(Tokenizer.unigram(uni).family == "unigram")
  }

  test("both families id-encode through the trait exactly as through the direct call") {
    val merges = Bpe.learnMerges(docs, "text", numMerges = 4)
    val dict = docs.collect().toSeq
      .flatMap(_.getString(1).split(" ")).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    val vocab = Bpe.buildVocab(dict, merges)
    val uni = Unigram.trainFromDictionary(Seq(("aa", 5L), ("bb", 3L), ("cc", 2L)))
    val viaTrait = docs.select(
      col("doc_id"),
      Tokenizer.bpe(merges, vocab).encodeIds(col("text")).as("b"),
      Tokenizer.unigram(uni).encodeIds(col("text")).as("u"))
    val direct = docs.select(
      col("doc_id"),
      Bpe.encodeIds(col("text"), merges, vocab).as("b"),
      Unigram.encodeIds(col("text"), uni).as("u"))
    assert(viaTrait.collect().toSeq.sortBy(_.getLong(0)).map(_.toString) ==
      direct.collect().toSeq.sortBy(_.getLong(0)).map(_.toString))
    // both render the same struct shape — the packer/shard-writer contract
    assert(viaTrait.select("b.n_tokens", "b.n_oov", "b.ids").columns.toSeq ==
      viaTrait.select("u.n_tokens", "u.n_oov", "u.ids").columns.toSeq)
  }

  test("a count-only BPE tokenizer refuses to mint ids without the persisted vocabulary") {
    val merges = Bpe.learnMerges(docs, "text", numMerges = 4)
    val e = intercept[IllegalArgumentException](
      Tokenizer.bpe(merges).encodeIds(col("text")))
    assert(e.getMessage.contains("vocabulary"))
  }

  test("packByTokenizer windows are identical to the hand-wired packByCount") {
    val uni = Unigram.trainFromDictionary(Seq(("aa", 5L), ("bb", 3L), ("cc", 2L)))
    val tok = Tokenizer.unigram(uni)
    val viaTrait = graft.ops.Packing
      .packByTokenizer(docs, "text", "doc_id", tok, budget = 8, shards = 2)
      .collect().toSeq.sortBy(_.getLong(0))
    val hand = graft.ops.Packing.packByCount(
      docs.withColumn("__n",
        Unigram.encodeStats(col("text"), uni).getField("n_tokens")),
      "__n", "doc_id", budget = 8, shards = 2)
      .collect().toSeq.sortBy(_.getLong(0))
    assert(viaTrait == hand)
  }
}
