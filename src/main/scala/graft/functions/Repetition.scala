package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gopher-style intra-document repetition signals (Rae et al. 2021 §A1.1,
  * the filter family RefinedWeb/FineWeb carried forward): per document,
  * the fraction of content claimed by its most frequent n-gram (n = 2-4)
  * and by ALL duplicated n-grams (n = 5-10). Natural text keeps every
  * signal small; boilerplate loops, scraped navigation, and generation
  * loops light them up long before a perplexity gate notices.
  *
  * Simplification vs the paper, pinned as contract by `RepetitionSpec`
  * and the q129 oracle: fractions are OCCURRENCE-weighted over the
  * engine-wide single-space tokens ([[Text.tokens]] — no character
  * weighting: the corpus contract already normalizes whitespace, and a
  * count fraction is the same discriminator without smuggling token
  * LENGTH into a repetition signal). Exact integer e6 half-up
  * ([[ExactAgg.divHalfUp]] semantics), so the DuckDB oracle re-derives
  * every value bit-identically from the base table. A document with
  * fewer than n+1 tokens has no repeatable n-gram window and scores 0
  * (top fraction would be degenerately 1 at exactly n tokens — one
  * n-gram, trivially "most frequent" — which is length pathology, not
  * repetition; the length heuristics own short docs).
  *
  * Scale shape (100 TB): ONE codegen map pass — each document scores on
  * its partition against its own bounded hash table, no explode, no
  * shuffle, nothing collected. This is the per-row dual of
  * [[Text.topTokenRatios]]'s explode+aggregate shape: repetition is a
  * function of one document, so at corpus scale it must not pay a
  * (doc_id, ngram) exchange the way cross-document statistics
  * ([[Text.boilerplateStats]]) legitimately do.
  */
object Repetition {

  /** The n range scored by the TOP-fraction signals. */
  val TopNs: Seq[Int] = Seq(2, 3, 4)

  /** The n range scored by the DUPLICATED-fraction signals. */
  val DupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)

  /** Gate ceilings (e6) per signal, aligned with [[TopNs]] ++ [[DupNs]] —
    * the Gopher paper's published thresholds (0.20/0.18/0.16 for top
    * 2/3/4-grams; 0.15 down to 0.10 for duplicated 5-10-grams), carried
    * at face value onto the occurrence-weighted fractions. One shared
    * constant: the q129 gate column and its oracle both interpolate THIS
    * sequence, so the two engines cannot drift.
    */
  val GateMaxE6: Seq[Long] =
    Seq(200000L, 180000L, 160000L, 150000L, 140000L, 130000L, 120000L, 110000L, 100000L)

  /** `struct(n_tokens, top2_e6, top3_e6, top4_e6, dup5_e6..dup10_e6)` in
    * one codegen pass. `n_tokens` is the engine-wide [[Text.tokenCount]]
    * convention (an empty string splits to one empty token — what DuckDB's
    * `string_split` also does, so the oracle mirrors it for free).
    */
  def signals(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))

  /** The signal field names in schema order (after `n_tokens`). */
  val SignalFields: Seq[String] =
    TopNs.map(n => s"top${n}_e6") ++ DupNs.map(n => s"dup${n}_e6")
}

/** `repetition_stats(string)` → the [[Repetition]] signal struct. The
  * per-document hash table is rebuilt per n (6+3 passes over the token
  * array, each O(tokens)); [[UnigramEncoder]]'s addReferenceObj transport
  * is unnecessary — the expression carries no model state.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires string, got ${other.sql}")
  }

  override def dataType: DataType = StructType(
    StructField("n_tokens", LongType, nullable = false) +:
      Repetition.SignalFields.map(f => StructField(f, LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(v: Any): Any =
    RepetitionStats.eval(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mod = s"${RepetitionStats.getClass.getName}.MODULE$$"
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $mod.eval($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  /** Exactly [[ExactAgg.divHalfUp]] over positive longs. */
  private def fracE6(part: Long, total: Long): Long =
    if (total <= 0L) 0L else Math.floorDiv(part * 2000000L + total, total * 2L)

  def eval(text: UTF8String): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val nTok = toks.length // empty string still splits to one empty token
    val out = new Array[Any](1 + Repetition.SignalFields.length)
    out(0) = nTok.toLong
    var slot = 1
    val counts = new java.util.HashMap[String, Int]()
    (Repetition.TopNs ++ Repetition.DupNs).foreach { n =>
      val total = nTok - n + 1 // n-gram window count
      var topCnt = 0L
      var dupOcc = 0L
      if (total >= 2) { // a lone window cannot repeat (see object doc)
        counts.clear()
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < total) {
          sb.setLength(0)
          var j = i
          while (j < i + n) {
            if (j > i) sb.append(' ')
            sb.append(toks(j))
            j += 1
          }
          counts.merge(sb.toString, 1, (a, b) => a + b)
          i += 1
        }
        val it = counts.values().iterator()
        while (it.hasNext) {
          val c = it.next().toLong
          if (c > topCnt) topCnt = c
          if (c >= 2L) dupOcc += c
        }
      }
      val isTop = slot <= Repetition.TopNs.length
      out(slot) =
        if (total < 2) 0L
        else if (isTop) fracE6(topCnt, total.toLong)
        else fracE6(dupOcc, total.toLong)
      slot += 1
    }
    new GenericInternalRow(out)
  }
}
