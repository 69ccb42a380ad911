package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChatTemplateSpec extends SparkSpec {
  import spark.implicits._

  test("render serializes the exact ChatML turn structure") {
    val out = Seq(("sys prompt", "hi there", "hello!")).toDF("s", "u", "a")
      .select(ChatTemplate.render(col("s"), col("u"), col("a")))
      .head().getString(0)
    assert(out ==
      "<|im_start|>system\nsys prompt\n<|im_end|>\n" +
      "<|im_start|>user\nhi there\n<|im_end|>\n" +
      "<|im_start|>assistant\nhello!\n<|im_end|>\n")
  }

  test("null content renders an EMPTY turn, not a missing one") {
    val out = Seq((null: String, "q", "a")).toDF("s", "u", "a")
      .select(ChatTemplate.render(col("s"), col("u"), col("a")))
      .head().getString(0)
    // the system turn is present with empty content, so the user and
    // assistant spans sit at the same offsets as with a system prompt
    assert(out.startsWith("<|im_start|>system\n\n<|im_end|>\n<|im_start|>user\n"))
  }

  test("renderConversations budgets tokens of the serialized form") {
    val out = ChatTemplate.renderConversations(
      Seq((1L, "s", "u u2", "a")).toDF("id", "s", "u", "a"), "s", "u", "a")
      .select("rendered_tokens").head().getLong(0)
    // single-space split of the rendered sample (newlines stay inside
    // tokens): "<|im_start|>system\ns\n<|im_end|>\n<|im_start|>user\nu" /
    // "u2\n<|im_end|>\n<|im_start|>assistant\na\n<|im_end|>\n" -> 2 tokens
    val rendered = ChatTemplate.renderConversations(
      Seq((1L, "s", "u u2", "a")).toDF("id", "s", "u", "a"), "s", "u", "a")
      .select("rendered").head().getString(0)
    assert(out == rendered.split(" ", -1).length.toLong)
  }

  test("renders pack under packByCount (the SFT packing composition)") {
    val conv = (0L until 20L).map(i => (i, s"sys$i", s"user question $i", s"answer $i"))
      .toDF("doc_id", "s", "u", "a")
    val packed = Packing.packByCount(
      ChatTemplate.renderConversations(conv, "s", "u", "a"),
      "rendered_tokens", "doc_id", budget = 16, shards = 2)
    assert(packed.count() == 20L)
    assert(packed.agg(max("pack_last")).head().getLong(0) >= 1L,
      "multiple windows must be needed at this budget")
  }
}
