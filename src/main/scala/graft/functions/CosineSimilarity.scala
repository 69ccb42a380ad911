package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over `array<float>`.
  *
  * Spark's higher-order array functions (`zip_with`/`aggregate`) have no
  * `doGenCode` — each element evaluation goes through the interpreted
  * lambda machinery. This expression generates a tight primitive loop
  * inside WholeStageCodegen instead: one pass accumulating dot product and
  * both norms, no per-element allocation. The arithmetic (float→double
  * widening, sequential accumulation, `dot / (√na · √nb)`) is ordered
  * exactly like the [[Similarity.cosine]] HOF composition, so results are
  * bit-identical and the same DuckDB oracle covers both.
  *
  * Assumes non-null array elements (embedding vectors); a null ARRAY input
  * propagates null via the standard BinaryExpression null contract.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires (array<float>, array<float>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |double $na = 0.0;
         |double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point for the native expression. */
  def cosineNative(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** SparkSessionExtensions hook: registers the engine's native expressions
  * for SQL users — similarity: `cosine_sim(a, b)`, `dot_product(a, b)`;
  * quantization: `quantize_int8(v)`, `cosine_int8(a, b)`; dedup:
  * `minhash_sig(tokens, nHashes, seed)`, `simhash_fp(tokens, seed)`,
  * `sig_agree(a, b)`. Enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // conf-gated logical rewrite: SQL inequality range joins plan as binned
    // equi-joins (see graft.plans.RangeJoinRewrite; off unless
    // spark.graft.rangeJoin.binWidthSec is set)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // arity guard: a missing argument must fail analysis with the function's
    // name and position, not an IndexOutOfBoundsException from children(1)
    def arg(fn: String, children: Seq[Expression], i: Int): Expression = {
      require(children.size > i,
        s"$fn expects at least ${i + 1} arguments, got ${children.size}")
      children(i)
    }
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) =>
        CosineSimilarity(arg("cosine_sim", children, 0), arg("cosine_sim", children, 1))))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) =>
        DotProduct(arg("dot_product", children, 0), arg("dot_product", children, 1))))
    ext.injectFunction((
      new FunctionIdentifier("quantize_int8"),
      new ExpressionInfo(classOf[QuantizeInt8].getName, "quantize_int8"),
      (children: Seq[Expression]) => QuantizeInt8(arg("quantize_int8", children, 0))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_int8"),
      new ExpressionInfo(classOf[Int8Cosine].getName, "cosine_int8"),
      (children: Seq[Expression]) =>
        Int8Cosine(arg("cosine_int8", children, 0), arg("cosine_int8", children, 1))))
    // round-10 per-row dedup natives: parameters arrive as SQL literal
    // arguments (they are plan constants baked into the generated code, so
    // they must be foldable — a column-valued nHashes has no meaning)
    def litLong(e: Expression, what: String): Long = e match {
      case f if f.foldable => f.eval() match {
        case i: Int => i.toLong
        case l: Long => l
        case other => throw new IllegalArgumentException(
          s"$what must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(s"$what must be a literal")
    }
    def litInt(e: Expression, what: String): Int = {
      val l = litLong(e, what)
      require(l >= Int.MinValue && l <= Int.MaxValue, s"$what out of Int range: $l")
      l.toInt
    }
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSignature(
        arg("minhash_sig", children, 0),
        if (children.size > 1) litInt(children(1), "nHashes") else 64,
        // seed is Long-typed across the DataFrame API — litLong, not a
        // truncating Int round-trip (a seed above Int.MaxValue would
        // silently compute bit-different signatures than the same seed
        // through MinHash.signatureNative)
        if (children.size > 2) litLong(children(2), "seed") else 42L)))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashFingerprint].getName, "simhash_fp"),
      (children: Seq[Expression]) => SimHashFingerprint(
        arg("simhash_fp", children, 0),
        if (children.size > 1) litInt(children(1), "nBits") else 60)))
    ext.injectFunction((
      new FunctionIdentifier("sig_agree"),
      new ExpressionInfo(classOf[SigAgreeCount].getName, "sig_agree"),
      (children: Seq[Expression]) =>
        SigAgreeCount(arg("sig_agree", children, 0), arg("sig_agree", children, 1))))
  }
}
