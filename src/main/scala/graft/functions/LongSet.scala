package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native membership test against a MODEL-SIZED immutable long set that
  * ships inside the serialized plan: `value IN sortedSet`, evaluated as a
  * binary search over a shared `long[]`.
  *
  * Why not `array_contains(lit(arr), x)`: the literal-array scan is
  * O(|set|) PER ELEMENT, so a per-row higher-order filter over a document's
  * spans pays O(spans × |set|) — fine at tens of entries, hostile at the
  * 10⁵–10⁶-entry sets a corpus-global blocklist legitimately reaches under
  * its broadcast ceiling. The binary search is O(log |set|) with zero
  * per-row allocation, and the array object is attached once per task via
  * the codegen reference table (NOT re-serialized per evaluation).
  *
  * Why not a join: this expression exists exactly for the zero-shuffle
  * rewrite paths (e.g. [[Text.hotSpanScrub]]) where the membership test
  * runs INSIDE an array lambda on the scan projection — a join would force
  * exploding the array through a shuffle and re-assembling the document.
  * Callers must keep the set under an explicit ceiling and degrade to the
  * join form above it (the q82 blocklist contract).
  *
  * The companion sorts defensively; the expression itself requires a sorted
  * array (binary search's contract).
  */
case class SortedLongSetContains(child: Expression, sortedSet: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_set_contains requires BIGINT input, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "long_set_contains"

  override protected def nullSafeEval(v: Any): Any =
    java.util.Arrays.binarySearch(sortedSet, v.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("sortedLongSet", sortedSet, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = java.util.Arrays.binarySearch($arr, $v) >= 0;")
  }

  // the set is part of the expression's identity for plan equality, but
  // comparing by reference is enough (each call site materializes one array)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LongSet {

  /** Column API: `v IN set`, O(log |set|) per row. Sorts (a copy of) the
    * set once at plan construction; duplicates are harmless.
    */
  def contains(v: Column, set: Array[Long]): Column = {
    val sorted = set.clone()
    java.util.Arrays.sort(sorted)
    ColumnBridge.column(SortedLongSetContains(ColumnBridge.expression(v), sorted))
  }
}
