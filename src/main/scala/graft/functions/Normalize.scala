package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for ingest pipelines: the same logical
  * character arrives from the web in composed, decomposed and
  * compatibility forms ("café" four different byte-ways), and every
  * downstream exact operator — fingerprints, token hashes, span counts,
  * dedup — treats them as distinct documents unless ingest canonicalizes
  * first. Tokenizer pipelines (SentencePiece's default, GPT-2 data prep)
  * normalize before anything else; this module is that stage.
  *
  * NFC is the oracled contract: Unicode normalization is an exact,
  * version-stable algorithm for assigned code points, and DuckDB ships
  * `nfc_normalize`, so q103 value-checks the JVM implementation
  * (`java.text.Normalizer`) against an independent one byte-for-byte.
  * NFKC (the compatibility fold most tokenizers actually use) has no
  * DuckDB twin — it is spec-pinned instead, same boundary as the
  * multimodal codecs.
  *
  * Scale shape: per-row map inside whole-stage codegen, no shuffle; the
  * fast path (`Normalizer.isNormalized`, true for ~all real text) skips
  * the rewrite allocation entirely.
  */
object Normalize {

  /** Canonical composition (NFC). */
  def nfc(text: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), "NFC"))

  /** Compatibility composition (NFKC) — fullwidth forms, ligatures and
    * compatibility variants fold to their plain equivalents. */
  def nfkc(text: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), "NFKC"))

  /** Zero-width and BOM code points — invisible characters that poison
    * exact dedup and token hashing. ONE constant, interpolated into the
    * oracle SQL (the q68 shared-pattern contract). The class members are
    * the LITERAL code points, not `\u` escapes: Java regex understands
    * `\uXXXX`, RE2 (DuckDB) does not — literal characters parse
    * identically in both.
    */
  val ZeroWidthPattern: String = "[​‌‍﻿]"

  def stripZeroWidth(text: Column): Column =
    regexp_replace(text, ZeroWidthPattern, "")

  /** The ingest canonicalization stage: NFC + zero-width strip. (NFKC is
    * deliberately NOT in the default stage — it is lossy ("ﬁ" → "fi",
    * "²" → "2") and belongs to the tokenizer's contract, not the lake's;
    * callers wanting it compose [[nfkc]] explicitly.)
    */
  def canonicalize(text: Column): Column = stripZeroWidth(nfc(text))
}

/** `unicode_normalize(string)` → string under a fixed normalization form.
  * The fast membership test runs first — for already-normalized text
  * (~all of a real corpus) the input UTF8String passes through without
  * copying; only abnormal rows pay the decompose/recompose.
  */
private[graft] class UnicodeNormalizer(form: String) extends Serializable {
  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  /** Normalize one value; identity (no copy) when already in form. */
  def normalize(v: UTF8String): UTF8String = {
    val s = v.toString
    if (java.text.Normalizer.isNormalized(s, nf)) v
    else UTF8String.fromString(java.text.Normalizer.normalize(s, nf))
  }
}

case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires string, got ${other.sql}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val normalizer = new UnicodeNormalizer(form)

  override protected def nullSafeEval(v: Any): Any =
    normalizer.normalize(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.addReferenceObj("unicodeNorm", normalizer, classOf[UnicodeNormalizer].getName)
      s"${ev.value} = $n.normalize($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
