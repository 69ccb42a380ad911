package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher repetition signals: exact-by-eye fractions on hand documents,
  * the short-doc zero rule, boundary behavior of the gate ceilings.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def sigOne(text: String): Map[String, Long] = {
    val fields = "n_tokens" +: Repetition.SignalFields
    val row = Seq(text).toDF("t")
      .select(Repetition.signals(col("t")).as("r"))
      .select(fields.map(f => col(s"r.$f")): _*)
      .head()
    fields.zipWithIndex.map { case (f, i) => f -> row.getLong(i) }.toMap
  }

  test("fractions are exact e6 half-up on a hand document") {
    // "a b a b a b": bigrams (5) = {a b: 3, b a: 2} -> top2 = 3/5;
    // trigrams (4) = {a b a: 2, b a b: 2} -> top3 = 2/4; 4-grams (3) =
    // {a b a b: 2, b a b a: 1} -> top4 = 2/3 (half-up 666667); 5-grams
    // (2) both distinct -> dup5 = 0; n >= 6 has < 2 windows -> 0
    val s = sigOne("a b a b a b")
    assert(s("n_tokens") == 6L)
    assert(s("top2_e6") == 600000L)
    assert(s("top3_e6") == 500000L)
    assert(s("top4_e6") == 666667L)
    assert(s("dup5_e6") == 0L)
    assert(Repetition.DupNs.drop(1).forall(n => s(s"dup${n}_e6") == 0L))
  }

  test("a fully looped document saturates every signal; distinct text stays low") {
    val loop = sigOne(Seq.fill(12)("x").mkString(" "))
    assert(loop("top2_e6") == 1000000L && loop("dup5_e6") == 1000000L)
    assert(loop("dup10_e6") == 1000000L) // 3 windows, all identical
    val distinct = sigOne("a b c d e f g h i j k l")
    // no repeated n-gram anywhere: top fractions = 1/windows, dups = 0
    assert(distinct("top2_e6") == 90909L) // divHalfUp(1e6, 11)
    assert(Repetition.DupNs.forall(n => distinct(s"dup${n}_e6") == 0L))
  }

  test("docs with fewer than two n-gram windows score zero, not degenerate one") {
    val two = sigOne("a b") // exactly one bigram window
    assert(two("n_tokens") == 2L && two("top2_e6") == 0L)
    val empty = sigOne("") // engine-wide: one empty token
    assert(empty("n_tokens") == 1L)
    assert((Repetition.SignalFields).forall(f => empty(f) == 0L))
  }

  test("gate ceilings align with the signal order and catch the looped doc") {
    assert(Repetition.GateMaxE6.length == Repetition.SignalFields.length)
    val fields = Repetition.SignalFields
    def gateOf(text: String): Long =
      Seq(text).toDF("t")
        .select(Repetition.signals(col("t")).as("r"))
        .select(fields.zip(Repetition.GateMaxE6)
          .map { case (f, m) => col(s"r.$f") <= m }
          .reduce(_ && _).cast("long").as("ok"))
        .as[Long].head()
    assert(gateOf(Seq.fill(12)("x").mkString(" ")) == 0L)
    assert(gateOf("a b c d e f g h i j k l") == 1L)
    // boundary: top2 exactly AT the 0.20 ceiling passes (<=, not <).
    // 26 tokens, "a b" planted 5 times between distinct fillers: bigram
    // windows 25, top2 = 5/25 = 200000 exactly; every longer n-gram is
    // unique (each plant has distinct neighbors), so only top2 is hot
    val atCeiling = (1 to 5)
      .map(k => s"f${3 * k - 2} f${3 * k - 1} f${3 * k} a b")
      .mkString(" ") + " f16"
    assert(sigOne(atCeiling)("top2_e6") == 200000L)
    assert(gateOf(atCeiling) == 1L)
    // one more plant tips it over: 6/30 windows... use a shorter doc —
    // "a b" 5 of 24 windows at 25 tokens = 208333 > the ceiling
    val over = (1 to 5)
      .map(k => s"f${3 * k - 2} f${3 * k - 1} f${3 * k} a b")
      .mkString(" ")
    assert(sigOne(over)("top2_e6") == 208333L)
    assert(gateOf(over) == 0L)
  }
}
