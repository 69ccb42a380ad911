package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native per-row SimHash fingerprint — the same one-row-in-one-row-out
  * argument as [[MinHash]]: a document's fingerprint is a pure function of
  * its own token set, so the explode-distinct → 60 conditional-sum
  * HashAggregate shape paid a row-per-token blowup plus a shuffle for what
  * one codegen'd loop computes in place.
  *
  * Bit-equality with the aggregate form ([[Dedup.simhashSignatures]]'
  * previous body; the q27 DuckDB oracle replicates it token by token and
  * is unchanged): per DISTINCT token, h = the md5-derived 60-bit
  * [[Dedup.tokenHash64]]; bit b's vote sum adds +1 when h has bit b set,
  * −1 otherwise; the fingerprint sets bit b iff the sum is positive.
  * Unlike MinHash's idempotent `min`, the vote SUM is duplicate-sensitive,
  * so the per-row dedupe here is not an optimization but the semantics —
  * an exact string set, mirroring `array_distinct`.
  *
  * Null contract, matching the explode form: null token array → null
  * fingerprint (explode of null emitted no rows, so the doc vanished from
  * the groupBy; the wrapper filters nulls to preserve that), and an EMPTY
  * array is also null — a vote over nothing has no value.
  */
object SimHash {

  /** Column API: `array<string>` tokens → 60-bit `long` fingerprint. */
  def fingerprintNative(tokens: Column, nBits: Int): Column =
    ColumnBridge.column(SimHashFingerprint(ColumnBridge.expression(tokens), nBits))
}

/** `simhash_fp(array<string>)` → `long`: see [[SimHash]]. */
case class SimHashFingerprint(child: Expression, nBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_fp requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty token array → null
  override def prettyName: String = "simhash_fp"

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) return null
    val votes = new Array[Int](nBits)
    val seen = new java.util.HashSet[Object](math.min(n * 2, 128))
    var t = 0
    while (t < n) {
      val tok = toks.getUTF8String(t)
      if (seen.add(tok)) {
        val d = org.apache.commons.codec.digest.DigestUtils.md5(tok.getBytes)
        var v60 = 0L
        var j = 0
        while (j < 7) { v60 = (v60 << 8) | (d(j) & 0xffL); j += 1 }
        v60 = (v60 << 4) | ((d(7) & 0xf0L) >>> 4)
        var b = 0
        while (b < nBits) {
          votes(b) += (if (((v60 >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var b = 0
    while (b < nBits) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // per-task scratch reused across rows, as in [[MinHashSignature]]
      val md = ctx.addMutableState("java.security.MessageDigest", "simhashMd",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val seen = ctx.addMutableState("java.util.HashSet", "simhashSeen",
        v => s"$v = new java.util.HashSet(128);")
      val votes = ctx.addMutableState("int[]", "simhashVotes",
        v => s"$v = new int[$nBits];")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val tok = ctx.freshName("tok")
      val d = ctx.freshName("d")
      val v60 = ctx.freshName("v")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  java.util.Arrays.fill($votes, 0);
         |  $seen.clear();
         |  for (int $t = 0; $t < $n; $t++) {
         |    org.apache.spark.unsafe.types.UTF8String $tok = $c.getUTF8String($t);
         |    if (!$seen.add($tok)) continue;
         |    byte[] $d = $md.digest($tok.getBytes());
         |    long $v60 = 0L;
         |    for (int $j = 0; $j < 7; $j++) $v60 = ($v60 << 8) | ($d[$j] & 0xffL);
         |    $v60 = ($v60 << 4) | (($d[7] & 0xf0L) >>> 4);
         |    for (int $b = 0; $b < $nBits; $b++) {
         |      $votes[$b] += ((($v60 >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |  long $fp = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    if ($votes[$b] > 0) $fp |= (1L << $b);
         |  }
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
