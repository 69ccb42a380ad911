package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** All non-ASCII test data is written as \\u escapes — literal composed/
  * decomposed characters in source are indistinguishable to a reviewer
  * and fragile under editor/transport normalization.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val Acute = "́" // combining acute
  private val EAcute = "é" // precomposed é
  private val Zwsp = "​"

  private def nfcOf(s: String): String =
    Seq(Tuple1(s)).toDF("t").select(Normalize.nfc(col("t"))).head().getString(0)

  test("NFC composes combining sequences and singletons") {
    assert(nfcOf("cafe" + Acute) == "caf" + EAcute)
    assert(nfcOf("Å") == "Å") // Angstrom sign -> A-ring
    // multi-combining: A + diaeresis + acute -> A-diaeresis + kept acute
    assert(nfcOf("Ä́") == "Ä́")
    // already-NFC passes through unchanged
    assert(nfcOf("caf" + EAcute + " plain ascii") == "caf" + EAcute + " plain ascii")
  }

  test("NFKC additionally folds compatibility forms (spec-pinned; no SQL twin)") {
    // fullwidth Hi, fi-ligature, superscript two
    val in = "Ｈｉ ﬁn ²"
    val out = Seq(Tuple1(in)).toDF("t")
      .select(Normalize.nfkc(col("t"))).head().getString(0)
    assert(out == "Hi fin 2")
    // ...while NFC leaves all three alone (canonical-only)
    assert(nfcOf(in) == in)
  }

  test("zero-width strip removes exactly the invisible class") {
    val in = "a​b‌c‍d﻿e f"
    val out = Seq(Tuple1(in)).toDF("t")
      .select(Normalize.stripZeroWidth(col("t"))).head().getString(0)
    assert(out == "abcde f")
  }

  test("canonicalize = NFC then strip; identical bytes dedup afterwards") {
    // the same logical text three byte-ways converges to one fingerprint
    val variants = Seq(
      (1L, "caf" + EAcute + " latte"),
      (2L, "cafe" + Acute + " latte"),
      (3L, "caf" + EAcute + Zwsp + " latte"))
    val fps = variants.toDF("id", "t")
      .select(Text.fingerprintBinary(Normalize.canonicalize(col("t"))).as("fp"))
      .distinct().count()
    assert(fps == 1L)
  }

  test("null propagates; normalization is partition-stable") {
    val out = Seq((1L, null: String)).toDF("id", "t")
      .select(Normalize.canonicalize(col("t"))).collect()
    assert(out(0).isNullAt(0))
    val docs = (0L until 32L).map(i => (i, s"v$Acute$i")).toDF("id", "t")
    val a = docs.select(Normalize.nfc(col("t")).as("n")).collect()
      .map(_.getString(0)).sorted.toSeq
    val b = docs.repartition(5).select(Normalize.nfc(col("t")).as("n")).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(a == b)
  }
}
