package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction, the step every web-crawl pipeline runs before
  * any text operator sees a document (Common Crawl WET-style): drop
  * script/style payloads, strip tags, decode the common entities,
  * collapse whitespace. Deliberately a CHAIN OF SHARED REGEX/REPLACE
  * CONSTANTS over built-in codegen `regexp_replace`/`replace` — no custom
  * expression needed, and the DuckDB oracle applies the identical chain,
  * so extraction is value-exact cross-engine (the q68/q76 contract).
  *
  * Not a browser: no entity table beyond the big six, no DOM repair, no
  * charset sniffing — the documented boundary, same spirit as the
  * multimodal codec quarantine. Malformed markup degrades to "tags
  * stripped as seen".
  *
  * Scale shape: per-row map inside whole-stage codegen, zero shuffle.
  */
object Html {

  /** `<script>`/`<style>` elements WITH their payload (the text inside is
    * code, not content). Dot-all + non-greedy; both Java regex and RE2
    * support `(?s)` and lazy quantifiers with leftmost-first semantics.
    * The closing-tag alternation is spelled out because RE2 has no
    * backreferences.
    */
  val ScriptStylePattern: String =
    "(?s)<(?:script|style)[^>]*>.*?</(?:script|style)\\s*>"

  /** Any remaining tag. */
  val TagPattern: String = "<[^>]*>"

  /** Whitespace runs → one space. An EXPLICIT class, not `\\s`: Java's
    * `\\s` includes U+000B, RE2's does not — the one place the engines'
    * regex dialects differ on this chain.
    */
  val WhitespaceRunPattern: String = "[ \\t\\n\\r]+"

  /** Entity decode table, applied in order — `&amp;` LAST, so
    * `&amp;lt;` decodes to the literal `&lt;` (one level, per spec) and
    * never double-decodes into `<`.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** The full extraction chain. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, ScriptStylePattern, " ")
    val noTags = regexp_replace(noScript, TagPattern, " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, WhitespaceRunPattern, " "))
  }

  /** The DuckDB mirror of [[extractText]], generated from the SAME
    * constants so the two chains cannot drift. DuckDB's `regexp_replace`
    * needs the explicit `'g'` flag for replace-all parity.
    */
  def extractTextSql(expr: String): String = {
    // the pattern strings interpolate VERBATIM: single-quoted SQL strings
    // do not process backslashes, so RE2 receives exactly what Java did
    val noScript = s"regexp_replace($expr, '$ScriptStylePattern', ' ', 'g')"
    val noTags = s"regexp_replace($noScript, '$TagPattern', ' ', 'g')"
    val decoded = Entities.foldLeft(noTags) { case (e, (from, to)) =>
      s"replace($e, '${from.replace("'", "''")}', '${to.replace("'", "''")}')"
    }
    s"trim(regexp_replace($decoded, '$WhitespaceRunPattern', ' ', 'g'))"
  }
}
