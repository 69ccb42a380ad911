package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram tokenizer: trainer determinism and vocabulary contract, exact
  * Viterbi costs and tie-breaks on a hand model, unknown handling,
  * production-vs-naive differential on a trained model, artifact IO.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val root = s"/tmp/graft-test-unigram-${java.util.UUID.randomUUID()}"

  // ---- hand model: costs chosen so every case is arithmetic by eye ----
  private def handModel = Unigram.Model(
    pieces = Array("a", "ab", "b", "c"),
    lpE4 = Array(10000L, 20000L, 10000L, 30000L),
    unkLpE4 = 70000L)

  private def encodeOne(text: String, m: Unigram.Model): (Long, Long, Long, String) =
    Seq(text).toDF("t")
      .select(Unigram.encodeStats(col("t"), m).as("u"))
      .select("u.n_tokens", "u.n_unk", "u.nll_e4", "u.tokens")
      .as[(Long, Long, Long, String)].head()

  test("Viterbi picks the cheapest segmentation and ties prefer the longest piece") {
    // "ab": [ab]=20000 ties [a b]=20000 -> longest final piece wins
    assert(encodeOne("ab", handModel) == ((1L, 0L, 20000L, "ab")))
    // "abc": [ab c]=50000 beats [a b c]=50000 (tie at the c boundary
    // resolves the prefix the same way) — and the cost is exact
    assert(encodeOne("abc", handModel) == ((2L, 0L, 50000L, "ab c")))
    // cheaper multi-token path must beat a pricier short one: make ab
    // expensive -> [a b]=20000 < [ab]=90000
    val m2 = handModel.copy(lpE4 = Array(10000L, 90000L, 10000L, 30000L))
    assert(encodeOne("ab", m2) == ((2L, 0L, 20000L, "a b")))
  }

  test("unknown single code points cost unk_lp_e4 and count; words split on spaces") {
    // z is unknown: [a z] with z at 70000; two words accumulate
    assert(encodeOne("az b", handModel) == ((3L, 1L, 90000L, "a z b")))
    // astral code point (surrogate pair) as the unknown — cp-level slicing
    val astral = "a🌍" // a + 🌍
    assert(encodeOne(astral, handModel) == ((2L, 1L, 80000L, "a 🌍")))
    assert(encodeOne("", handModel) == ((0L, 0L, 0L, "")))
  }

  test("trainer: chars always survive, vocab size respected, frequent pieces cheaper") {
    val dict = Seq(
      ("abab", 50L), ("ab", 30L), ("ba", 5L), ("cc", 2L), ("abc", 10L))
    val m = Unigram.trainFromDictionary(dict, vocabSize = 6, maxPieceLen = 3)
    val byPiece = m.pieces.zip(m.lpE4).toMap
    // the alphabet is always in the vocabulary
    assert(Set("a", "b", "c").subsetOf(byPiece.keySet))
    assert(m.pieces.length <= 6)
    assert(m.pieces.toSeq == m.pieces.toSeq.sorted, "canonical piece order")
    // "ab" dominates the corpus -> it must survive pruning and be cheaper
    // (more probable = lower -log2) than the rare "cc" path pieces
    assert(byPiece.contains("ab"), s"expected 'ab' to survive, got ${m.pieces.toSeq}")
    assert(byPiece("ab") < byPiece("c"))
    assert(m.unkLpE4 == m.lpE4.max + 40000L)
    // determinism: same dictionary -> identical model
    val m3 = Unigram.trainFromDictionary(dict, vocabSize = 6, maxPieceLen = 3)
    assert(m3.pieces.toSeq == m.pieces.toSeq && m3.lpE4.toSeq == m.lpE4.toSeq)
  }

  test("production encoder equals the naive reference on a trained model") {
    val docs = Seq(
      (0L, "abab ab ba"), (1L, "abc cc abab"), (2L, "xyz ab"),
      (3L, ""), (4L, "a b c ab")).toDF("doc_id", "text")
    // train WITHOUT doc 2 so x/y/z are genuinely outside the alphabet and
    // the differential covers the unknown path too
    val dict = Unigram.learnDictionary(docs.filter(col("doc_id") =!= 2), "text")
    val m = Unigram.trainFromDictionary(dict, vocabSize = 8, maxPieceLen = 3)
    val prod = docs
      .select(col("doc_id"), Unigram.encodeStats(col("text"), m).as("u"))
      .select(col("doc_id"), col("u.n_tokens"), col("u.n_unk"),
        col("u.nll_e4"), col("u.tokens"))
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val naive = Unigram.naiveTable(docs, "text", "doc_id", m)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(prod == naive)
    // tokens reconstruct each word (segmentation, not rewriting)
    prod.foreach { case (id, _, _, _, toks) =>
      val original = docs.filter(col("doc_id") === id)
        .as[(Long, String)].head()._2.split(" ").filter(_.nonEmpty).mkString
      assert(toks.split(" ").filter(_.nonEmpty).mkString == original)
    }
  }

  test("id-encode: canonical-order ids, reserved OOV id, exact by eye on the hand model") {
    // handModel pieces sorted: a=0, ab=1, b=2, c=3; unkId = 4
    def idsOne(text: String): (Long, Long, String) =
      Seq(text).toDF("t")
        .select(Unigram.encodeIds(col("t"), handModel).as("e"))
        .select("e.n_tokens", "e.n_oov", "e.ids")
        .as[(Long, Long, String)].head()
    assert(handModel.unkId == 4)
    assert(idsOne("ab") == ((1L, 0L, "1")))          // [ab] -> id 1
    assert(idsOne("abc") == ((2L, 0L, "1 3")))       // [ab c]
    assert(idsOne("az b") == ((3L, 1L, "0 4 2")))    // z -> reserved OOV id
    assert(idsOne("a🌍") == ((2L, 1L, "0 4")))       // astral unknown cp
    assert(idsOne("") == ((0L, 0L, "")))
  }

  test("production id-encode equals the naive id reference on a trained model") {
    val docs = Seq(
      (0L, "abab ab ba"), (1L, "abc cc abab"), (2L, "xyz ab"),
      (3L, ""), (4L, "a b c ab")).toDF("doc_id", "text")
    val dict = Unigram.learnDictionary(docs.filter(col("doc_id") =!= 2), "text")
    val m = Unigram.trainFromDictionary(dict, vocabSize = 8, maxPieceLen = 3)
    val prod = docs
      .select(col("doc_id"), Unigram.encodeIds(col("text"), m).as("e"))
      .select(col("doc_id"), col("e.n_tokens"), col("e.n_oov"), col("e.ids"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val naive = Unigram.naiveIdTable(docs, "text", "doc_id", m)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(prod == naive)
    // ids and tokens describe the SAME segmentation: id sequence length
    // matches the stats surface's token count on every doc
    val counts = docs
      .select(col("doc_id"), Unigram.encodeStats(col("text"), m).as("u"))
      .select(col("doc_id"), col("u.n_tokens")).as[(Long, Long)]
      .collect().toMap
    prod.foreach { case (id, n, _, ids) =>
      assert(ids.split(" ").count(_.nonEmpty).toLong == n && n == counts(id))
    }
    // the unknown path is exercised (doc 2 carries out-of-alphabet cps)
    assert(prod.find(_._1 == 2L).get._3 > 0L)
  }

  test("model IO round-trips and guards the scheme version") {
    val m = handModel
    Unigram.writeModel(spark, m, s"$root/m")
    val r = Unigram.readModel(spark, s"$root/m")
    assert(r.pieces.toSeq == m.pieces.toSeq)
    assert(r.lpE4.toSeq == m.lpE4.toSeq)
    assert(r.unkLpE4 == m.unkLpE4)
    IndexProtocol.writeLayoutPayload(spark, s"$root/alien", "unk=1,uni=999")
    val e = intercept[IllegalArgumentException](Unigram.readModel(spark, s"$root/alien"))
    assert(e.getMessage.contains("not scheme"))
    // a current-version model whose layout declares a different (or no)
    // OOV id story must be refused, not silently served as oov=unkid
    IndexProtocol.writeLayoutPayload(spark, s"$root/noov",
      s"unk=1,uni=${Unigram.Version}")
    val o = intercept[IllegalArgumentException](Unigram.readModel(spark, s"$root/noov"))
    assert(o.getMessage.contains("OOV story"))
  }

  test("byte-fallback story: unknown cps decompose into UTF-8 byte-tier ids, " +
      "exact by eye, story round-trips through the artifact") {
    val bm = handModel.copy(byteFallback = true)
    def idsOne(text: String, m: Unigram.Model): (Long, Long, String) =
      Seq(text).toDF("t")
        .select(Unigram.encodeIds(col("t"), m).as("e"))
        .select("e.n_tokens", "e.n_oov", "e.ids")
        .as[(Long, Long, String)].head()
    // known pieces unchanged: a=0, ab=1, b=2, c=3; byte tier starts at 4
    assert(idsOne("abc", bm) == ((2L, 0L, "1 3")))
    // z (U+007A, one byte 0x7A=122) -> id 4+122=126; counted in BOTH
    // n_tokens (serialization length) and n_oov (fallback mass)
    assert(idsOne("az b", bm) == ((3L, 1L, "0 126 2")))
    // astral 🌍 U+1F30D -> UTF-8 F0 9F 8C 8D -> 4+{240,159,140,141}
    assert(idsOne("a🌍", bm) == ((5L, 4L, "0 244 163 144 145")))
    // the story is part of the artifact: a consumer can never decode
    // byte-tier shards under the unkid convention
    Unigram.writeModel(spark, bm, s"$root/bytes")
    val r = Unigram.readModel(spark, s"$root/bytes")
    assert(r.byteFallback)
    assert(idsOne("a🌍 z", r) == idsOne("a🌍 z", bm))
    val plain = Unigram.readModel(spark, s"$root/m") // written by the IO test
    assert(!plain.byteFallback)
    // production equals the independent naive encoder under the story
    val docs = Seq((0L, "abc 🌍ab"), (1L, "az zz"), (2L, "")).toDF("doc_id", "text")
    val prod = docs
      .select(col("doc_id"), Unigram.encodeIds(col("text"), bm).as("e"))
      .select(col("doc_id"), col("e.n_tokens"), col("e.n_oov"), col("e.ids"))
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val naive = Unigram.naiveIdTable(docs, "text", "doc_id", bm)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(prod == naive)
  }

  test("canonical collation is code-point order: ids stable across persistence " +
      "for supplementary-plane vocabularies") {
    // U+1F600 (😀, supplementary: UTF-16 surrogates 0xD83D 0xDE00) vs
    // U+E000 (private use): compareTo (UTF-16 code-unit order) says
    // 😀 < U+E000, code-point/UTF-8 order says U+E000 < 😀. A model mixing
    // them exposes any collation split between train / read / search.
    val astral = new String(Character.toChars(0x1F600))
    val pua = "\uE000"
    assert(astral.compareTo(pua) < 0, "fixture must straddle the collation split")
    assert(Unigram.CanonicalOrder.compare(pua, astral) < 0)

    val dict = Seq((s"$pua$astral", 5L), (s"a$astral", 3L), ("ab", 2L))
    val m = Unigram.trainFromDictionary(dict, vocabSize = 8, maxPieceLen = 2)
    assert(m.pieces.contains(astral) && m.pieces.contains(pua))
    Unigram.writeModel(spark, m, s"$root/cp")
    val r = Unigram.readModel(spark, s"$root/cp")
    // same pieces in the SAME order -> same ids before and after persistence
    assert(r.pieces.toSeq == m.pieces.toSeq)

    // the encoder's binary search under the pinned comparator finds every
    // real piece — no silent OOV for pieces the collation split would
    // have mis-placed relative to the search order
    def idsOne(text: String, model: Unigram.Model): (Long, Long, String) =
      Seq(text).toDF("t")
        .select(Unigram.encodeIds(col("t"), model).as("e"))
        .select("e.n_tokens", "e.n_oov", "e.ids")
        .as[(Long, Long, String)].head()
    val text = s"$pua$astral a$astral"
    val before = idsOne(text, m)
    assert(before._2 == 0L, s"no piece may fall to OOV: $before")
    assert(idsOne(text, r) == before,
      "persisted model must serve identical ids")

    // a hand-built model sorted under the WRONG collation is refused at
    // construction — the invariant is load-bearing, not advisory
    val e = intercept[IllegalArgumentException](
      Unigram.Model(Array(astral, pua), Array(1L, 1L), 10L))
    assert(e.getMessage.contains("canonical"))
  }

  test("trainer refuses empty input and nonsense knobs") {
    val e = intercept[IllegalArgumentException](
      Unigram.trainFromDictionary(Seq.empty, vocabSize = 4))
    assert(e.getMessage.contains("non-empty"))
    val k = intercept[IllegalArgumentException](
      Unigram.trainFromDictionary(Seq(("ab", 1L)), vocabSize = 0))
    assert(k.getMessage.contains("vocabSize"))
  }
}
