package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- trainer

  test("trainFromDictionary learns the expected merges in rank order") {
    // freq-weighted classic example: "low" ×5, "lower" ×2, "newest" ×6
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L)
    val merges = Bpe.trainFromDictionary(dict, numMerges = 4)
    // round-1 pair counts: (w,e) = 2 ("lower") + 6 ("newest") = 8 beats
    // (l,o) = (o,w) = 7; so rank 0 is (w,e)
    assert(merges.head == ("w", "e"))
    // every learned merge must have been appliable (distinct, ordered)
    assert(merges.distinct == merges)
  }

  test("trainer tie-break is (left, right) lexicographic ascending") {
    // "ab" and "cd" both appear 3 times and share no symbols: counts tie at
    // 3, so rank 0 must be the lexicographically smaller pair (a,b)
    val merges = Bpe.trainFromDictionary(Seq("ab" -> 3L, "cd" -> 3L), 2)
    assert(merges == Seq(("a", "b"), ("c", "d")))
  }

  test("trainer counts overlapping occurrences and stops below minPairCount") {
    // "aaa" ×1: (a,a) counted twice (overlapping) -> meets minPairCount=2
    val m1 = Bpe.trainFromDictionary(Seq("aaa" -> 1L), 10, minPairCount = 2L)
    assert(m1.head == ("a", "a"))
    // after merging: ["aa","a"] -> pair (aa,a) count 1 < 2 -> stop
    assert(m1 == Seq(("a", "a")))
    // a pair seen once never merges
    assert(Bpe.trainFromDictionary(Seq("xy" -> 1L), 10).isEmpty)
  }

  // ------------------------------------------------------------- encoder

  private def ranksOf(merges: (String, String)*) = {
    val m = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, Integer.valueOf(i)) }
    m
  }

  test("encodePiece applies merges in RANK order, not positional order") {
    // rank 0 (s,t) fires before rank 1 (e,s) even though (e,s) occurs
    // earlier in the string — the GPT-2 loop contract
    val toks = Bpe.encodePiece("est", ranksOf(("s", "t"), ("e", "s")))
    assert(toks.toSeq == Seq("e", "st"))
    // positional greedy would have produced ["es","t"]
  }

  test("encodePiece merges all occurrences left-to-right non-overlapping") {
    val toks = Bpe.encodePiece("aaaa", ranksOf(("a", "a")))
    // one round merges (0,1) and (2,3): ["aa","aa"]; no (aa,aa) rank -> stop
    assert(toks.toSeq == Seq("aa", "aa"))
    val odd = Bpe.encodePiece("aaaaa", ranksOf(("a", "a")))
    assert(odd.toSeq == Seq("aa", "aa", "a"))
  }

  test("encodePiece chains merges to the fixed point") {
    val toks = Bpe.encodePiece("abab",
      ranksOf(("a", "b"), ("ab", "ab")))
    assert(toks.toSeq == Seq("abab"))
  }

  test("merge-order determinism: rank shadowing changes the result") {
    // with (a,b) ranked first, "abc" -> ["ab","c"]; with (b,c) first ->
    // ["a","bc"] — pins that rank, not position, decides
    assert(Bpe.encodePiece("abc", ranksOf(("a", "b"), ("b", "c"))).toSeq
      == Seq("ab", "c"))
    assert(Bpe.encodePiece("abc", ranksOf(("b", "c"), ("a", "b"))).toSeq
      == Seq("a", "bc"))
  }

  test("supplementary-plane code points are atomic symbols") {
    val gclef = new String(Character.toChars(0x1D11E))
    val toks = Bpe.encodePiece(gclef + "a" + gclef, ranksOf((gclef, "a")))
    assert(toks.toSeq == Seq(gclef + "a", gclef))
  }

  // ---------------------------------------- production vs naive differential

  test("naive and production encoders agree on an adversarial battery") {
    val merges = Seq(("a", "b"), ("b", "c"), ("ab", "c"), ("c", "c"),
      ("e", "s"), ("s", "t"), ("es", "t"), (" ", "t"), (" t", "h"), (" th", "e"))
    val ranks = ranksOf(merges: _*)
    val naive = merges.zipWithIndex.toMap
    val battery = Seq("", "a", "abc", "abcabc", "ccc", "cccc", "est", "tests",
      " the theme", "ababab", "абвабв", "ab c abc", "aab abc\tabc")
    for (s <- battery) {
      assert(Bpe.encodePiece(s, ranks).toSeq == Bpe.naiveEncodePiece(s, naive),
        s"diverged on piece '$s'")
    }
  }

  test("full-document naive encode pre-splits with the shared pattern") {
    val merges = Seq(("t", "h"), ("th", "e"), ("'", "t"))
    val toks = Bpe.naiveEncode("the theme isn't the end", merges)
    // doc-start piece "the": [t,h,e] -> (t,h) -> [th,e] -> (th,e) -> [the].
    // Later pieces keep their leading space (" the" = [' ','t','h','e'] ->
    // [' ','the']), so "the" merges but the space stays a separate token.
    assert(toks.head == "the")
    assert(toks.contains("the"))
    // contraction pre-split: "'t" is its own piece
    assert(toks.contains("'t"))
    // reconstruction: concat of tokens == concat of pieces
    assert(toks.mkString("") == "the theme isn't the end")
  }

  // --------------------------------------------------------- column surface

  test("encodeStats struct matches naive counts and reconstructs pieces") {
    val docs = Seq(
      (1L, "the theme of the thesis"),
      (2L, "it isn't over, 42 times it isn't"),
      (3L, ""),
      (4L, "multi   space   and 日本語 text")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 12)
    val out = docs.select(col("doc_id"), Bpe.encodeStats(col("text"), merges).as("s"))
      .select(col("doc_id"), col("s.n_pieces"), col("s.n_tokens"), col("s.detok"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    val pattern = java.util.regex.Pattern.compile(Text.BpeishPattern)
    for (((id, nPieces, nTokens, detok), row) <- out.zip(docs.orderBy("doc_id")
        .as[(Long, String)].collect())) {
      val (_, text) = row
      val m = pattern.matcher(text)
      val pieces = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toList
      assert(nPieces == pieces.length, s"doc $id n_pieces")
      assert(detok == pieces.mkString(""), s"doc $id detok")
      assert(nTokens == Bpe.naiveEncode(text, merges).length, s"doc $id n_tokens")
      assert(nTokens <= text.codePointCount(0, text.length), s"doc $id bound")
    }
  }

  test("encode column yields the token array; concat reconstructs pieces") {
    val docs = Seq((1L, "the theme the theme")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", numMerges = 8)
    val toks = docs.select(Bpe.encode(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks.mkString("") == "the theme the theme")
    assert(toks == Bpe.naiveEncode("the theme the theme", merges))
    // merges actually fired: fewer tokens than characters
    assert(toks.length < "the theme the theme".length)
  }

  test("learnMerges is deterministic and honors the vocab cap totally") {
    val docs = (0L until 50L).map(i => (i, s"alpha beta gamma token$i alpha beta"))
      .toDF("doc_id", "text")
    val a = Bpe.learnMerges(docs, "text", numMerges = 10, maxVocab = 5)
    val b = Bpe.learnMerges(docs, "text", numMerges = 10, maxVocab = 5)
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("merges round-trip through the persisted fixture in rank order") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_merges").toString
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"))
    Bpe.writeMerges(spark, merges, s"$dir/merges")
    assert(Bpe.readMerges(spark, s"$dir/merges") == merges)
  }

  test("buildVocab mints base code points then merge outputs, first rank wins dupes") {
    val dict = Seq("abc" -> 5L, "ab" -> 2L)
    // contrived merges where two paths produce "abc"
    val merges = Seq(("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc"))
    val vocab = Bpe.buildVocab(dict, merges)
    // base a,b,c then outputs ab, abc (first minting), bc — no dupe
    assert(vocab == Seq("a", "b", "c", "ab", "abc", "bc"))
  }

  test("encodeIds maps tokens through the vocab; OOV encodes as -1 and is counted") {
    val docs = Seq((1L, "the theme"), (2L, "the θ theme")).toDF("doc_id", "text")
    val dict = Bpe.learnDictionary(docs.filter(col("doc_id") === 1L), "text")
    val merges = Bpe.trainFromDictionary(dict, 8)
    val vocab = Bpe.buildVocab(dict, merges)
    assert(!vocab.contains("θ"), "θ is outside the training dictionary")
    val out = docs
      .select(col("doc_id"), Bpe.encodeIds(col("text"), merges, vocab).as("e"))
      .select(col("doc_id"), col("e.n_tokens"), col("e.n_oov"), col("e.ids"))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out(0)._3 == 0L, "doc 1 is fully in-vocab")
    assert(out(1)._3 == 1L, "θ is the one OOV token")
    assert(out(1)._4.split(" ").contains("-1"))
    // ids decode back to the production token stream through the vocab
    val toks1 = docs.filter(col("doc_id") === 1L)
      .select(Bpe.encode(col("text"), merges)).as[Seq[String]].head()
    val ids1 = out(0)._4.split(" ").map(_.toInt).toSeq
    assert(ids1.map(vocab(_)) == toks1)
    // and they match the independent naive-ids table row for row
    val naive = Bpe.naiveIdsTable(docs, "text", "doc_id", merges, vocab)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out.toSeq == naive.toSeq)
  }

  test("vocab round-trips through the persisted (id, token) table in id order") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_vocab").toString
    val vocab = Seq("a", "b", "ab", "abb")
    Bpe.writeVocab(spark, vocab, s"$dir/vocab")
    assert(Bpe.readVocab(spark, s"$dir/vocab") == vocab)
  }

  test("byte fallback: unseen symbols emit their UTF-8 bytes' ids, never -1") {
    val docs = Seq(
      (1L, "ab ab b"),                  // fully in-vocab
      (2L, "ab θ"),                // Greek theta: 2-byte UTF-8
      (3L, "ab 🚀")           // astral emoji: 4-byte UTF-8
    ).toDF("doc_id", "text")
    val dict = Seq(("ab", 5L), (" ab", 4L), (" b", 3L))
    val merges = Bpe.trainFromDictionary(dict, 8)
    val vocab = Bpe.buildVocabWithBytes(dict, merges)
    // the fallback tier sits after the learned vocab: 256 byte tokens
    assert(vocab.size == Bpe.buildVocab(dict, merges).size + 256)
    assert(vocab.contains(Bpe.byteToken(0)) && vocab.contains(Bpe.byteToken(255)))
    val out = docs
      .select(col("doc_id"),
        Bpe.encodeIds(col("text"), merges, vocab, byteFallback = true).as("e"))
      .select(col("doc_id"), col("e.n_tokens"), col("e.n_oov"), col("e.ids"))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out.forall(_._3 == 0L), s"byte fallback must make OOV impossible: ${out.toSeq}")
    assert(out.forall(!_._4.split(" ").contains("-1")))
    // theta = 0xCE 0xB8: exactly those two byte-token ids in stream order
    val thetaIds = Seq(0xce, 0xb8).map(b => vocab.indexOf(Bpe.byteToken(b)).toString)
    assert(out(1)._4.split(" ").takeRight(2).toSeq == thetaIds)
    // the emoji expands to its FOUR UTF-8 bytes
    val emojiIds = "🚀".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => vocab.indexOf(Bpe.byteToken(b & 0xff)).toString).toSeq
    assert(out(2)._4.split(" ").takeRight(4).toSeq == emojiIds)
    // in-vocab tokens keep their q105 ids: fallback off == fallback on for doc 1
    val plain = docs.filter(col("doc_id") === 1L)
      .select(Bpe.encodeIds(col("text"), merges, vocab).as("e"))
      .select(col("e.ids")).as[String].head()
    assert(out(0)._4 == plain)
    // and the independent textbook encoder agrees row for row
    val naive = Bpe.naiveIdsTable(docs, "text", "doc_id", merges, vocab, byteFallback = true)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out.toSeq == naive.toSeq)
  }

  test("byte fallback over a byte-less vocab degrades to counted OOV") {
    val dict = Seq(("ab", 5L))
    val merges = Bpe.trainFromDictionary(dict, 4)
    val vocab = Bpe.buildVocab(dict, merges) // no byte tier
    val out = Seq((1L, "ab θ")).toDF("doc_id", "text")
      .select(Bpe.encodeIds(col("text"), merges, vocab, byteFallback = true).as("e"))
      .select(col("e.n_oov"), col("e.ids")).as[(Long, String)].head()
    // " θ" falls back as three bytes (0x20 + the two theta bytes), none
    // resolvable without the byte tier
    assert(out._1 == 3L && out._2.split(" ").count(_ == "-1") == 3,
      "each unresolved byte counts as one OOV")
  }

  test("null text yields null struct; whitespace-only text yields zero counts") {
    val docs = Seq((1L, null: String), (2L, "   ")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        Bpe.encodeStats(col("text"), Seq(("a", "b"))).as("s"))
      .orderBy("doc_id").collect()
    assert(out(0).isNullAt(1))
    val r = out(1).getStruct(1)
    // "   " has no piece match (bare spaces attach only to a following
    // letter/number/symbol run) -> 0 pieces, 0 tokens, empty detok
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.getString(2) == "")
  }
}
