package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Int8 embedding quantization + quantized cosine — the memory-bandwidth
  * lever for ANN at corpus scale: per-vector max-abs quantization shrinks a
  * 64-dim float vector from 256 to 64 bytes (4×) while preserving cosine
  * ordering up to quantization error, because cosine is invariant to the
  * per-vector scale factor the quantizer divides out.
  *
  * Both operations are native codegen expressions for the same reason as
  * [[CosineSimilarity]]: Spark's higher-order array functions evaluate
  * interpreted (no `doGenCode`), and quantization is a corpus-scale pass.
  * Like [[CosineSimilarity]], both assume non-null ARRAY ELEMENTS
  * (embedding vectors); a null array input propagates null via the
  * standard unary/binary expression null contract.
  *
  * Cross-engine exactness (what lets q63 be value-oracled in DuckDB): the
  * quantized values are produced by `floor(x / maxabs * 127.0 + 0.5)` over
  * exactly-representable float→double casts — identical IEEE ops in either
  * engine — and the quantized cosine's dot/norm accumulations are INTEGER
  * sums bounded by dims·127² ≪ 2^53, exact in any order and any numeric
  * type, leaving one final sqrt+division on identical doubles.
  */
object Int8Ops {

  /** Version tag for the quantization SCHEME, stamped into persisted-index
    * fixtures (q67/q70): data quantized under one scheme must never be
    * served after the scheme changes, and the scheme lives in code where a
    * data-content stamp can't see it. Bump on any change to the quantized
    * representation (currently per-vector max-abs, round-half-up to
    * [-127, 127]).
    */
  val QuantizerVersion = "int8-maxabs-v1"

  /** Column API: `array<float>` → `array<byte>` max-abs quantization. */
  def quantizeInt8Native(v: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v)))

  /** Column API: cosine over two `array<byte>` quantized vectors. */
  def cosineInt8Native(a: Column, b: Column): Column =
    ColumnBridge.column(Int8Cosine(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `quantize_int8(array<float>)` → `array<byte>`:
  * qᵢ = floor(vᵢ / max|v| · 127 + 0.5), an all-zero vector quantizes to
  * all zeros. Output magnitudes are ≤ 127 by construction (the max-|v|
  * element lands on exactly ±127), so no clamp is needed.
  */
case class QuantizeInt8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_int8 requires array<float>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "quantize_int8"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var ma = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(x.getFloat(i).toDouble)
      if (a > ma) ma = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (ma > 0.0) {
      i = 0
      while (i < n) {
        out(i) = math.floor(x.getFloat(i).toDouble / ma * 127.0 + 0.5).toByte
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ma = ctx.freshName("ma")
      val a = ctx.freshName("a")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |double $ma = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs((double) $c.getFloat($i));
         |  if ($a > $ma) $ma = $a;
         |}
         |byte[] $out = new byte[$n];
         |if ($ma > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = (byte) java.lang.Math.floor(
         |      (double) $c.getFloat($i) / $ma * 127.0 + 0.5);
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cosine_int8(array<byte>, array<byte>)` → double: integer-accumulated
  * dot product and norms (exact — bounded by dims·127² ≪ 2^53), then
  * `dot / (√na · √nb)` factored exactly like [[CosineSimilarity]] so the
  * DuckDB oracle reproduces the identical double.
  *
  * Edge conventions (shared with [[CosineSimilarity]]): inputs are
  * expected EQUAL-LENGTH (a fixed embedding dimension); mismatched arrays
  * score over the common prefix rather than failing. A zero-quantized
  * vector (the all-zero embedding) scores 0/0 = NaN everywhere — and both
  * Spark and DuckDB order NaN above every other double, so even a NaN row
  * ranks identically in the two engines' top-k windows
  * (`Int8OpsSpec` "zero vector" pins the behavior; the embeddings corpora
  * contain no zero vectors, so no oracled row exercises it).
  */
case class Int8Cosine(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_int8 requires (array<byte>, array<byte>), got (${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_int8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var na = 0L
    var nb = 0L
    var i = 0
    while (i < n) {
      val xi = x.getByte(i).toLong
      val yi = y.getByte(i).toLong
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
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
         |long $dot = 0L;
         |long $na = 0L;
         |long $nb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $x = (long) $a.getByte($i);
         |  long $y = (long) $b.getByte($i);
         |  $dot += $x * $y;
         |  $na += $x * $x;
         |  $nb += $y * $y;
         |}
         |${ev.value} = (double) $dot /
         |  (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
