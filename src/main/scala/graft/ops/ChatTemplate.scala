package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Chat-template rendering for SFT data preparation: fine-tuning corpora
  * arrive as (system, user, assistant) turn columns and must be rendered
  * into the exact serialized form the trainer tokenizes — special tokens,
  * role headers, turn terminators. Template drift between data prep and
  * training silently corrupts a fine-tune (the loss lands on the wrong
  * spans), so the contract here is the same one the engine applies to
  * regexes and hash formulas: the template is ONE set of shared constants,
  * the rendering is pure built-in `concat` (codegen, zero shuffle), and
  * the DuckDB oracle renders with the identical constants.
  *
  * The template is the ChatML shape (`<|im_start|>role\ncontent\n
  * <|im_end|>`), the most common open-weights convention; the constants
  * are parameters, so a deployment swaps its own header/footer strings
  * without touching the operator.
  */
object ChatTemplate {

  /** ChatML-style defaults — swap per deployment. */
  val TurnHeader: String = "<|im_start|>"
  val TurnFooter: String = "<|im_end|>"

  /** Render one turn: header + role + newline + content + newline +
    * footer + newline. Null content renders as an EMPTY turn (header and
    * footer still present) — a missing system prompt must not shift the
    * user/assistant spans that follow it.
    */
  def turn(role: String, content: Column): Column =
    concat(lit(TurnHeader + role + "\n"),
      coalesce(content, lit("")), lit("\n" + TurnFooter + "\n"))

  /** Render a (system, user, assistant) triple to the serialized training
    * sample. Any column may be null; the turn structure is fixed.
    */
  def render(system: Column, user: Column, assistant: Column): Column =
    concat(turn("system", system), turn("user", user), turn("assistant", assistant))

  /** Render + budget a conversation table in one pass: the serialized
    * sample plus its single-space token count (the packing currency —
    * feed `rendered_tokens` to [[Packing.packByCount]] to pack SFT
    * samples into context windows).
    */
  def renderConversations(
      df: DataFrame,
      systemCol: String,
      userCol: String,
      assistantCol: String): DataFrame =
    df.withColumn("rendered",
        render(col(systemCol), col(userCol), col(assistantCol)))
      .withColumn("rendered_tokens", Text.tokenCount(col("rendered")).cast("long"))

  /** The DuckDB mirror of [[render]], generated from the same constants. */
  def renderSql(system: String, user: String, assistant: String): String = {
    def t(role: String, content: String) =
      s"'${TurnHeader}$role' || chr(10) || COALESCE($content, '') || chr(10) || '$TurnFooter' || chr(10)"
    s"${t("system", system)} || ${t("user", user)} || ${t("assistant", assistant)}"
  }
}
