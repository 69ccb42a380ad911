package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Span segmentation + the two span-rewrite operators: corpus-wide hot-span
  * scrub (q84) and intra-document repeated-span removal (q85).
  */
class SpanOpsSpec extends SparkSpec {
  import spark.implicits._

  private def spansOf(text: String, k: Int): Seq[String] =
    Seq(text).toDF("t").select(Text.spanChunks(col("t"), k)).as[Seq[String]].head()

  test("spanChunks tiles non-overlapping k-token spans with a short tail") {
    assert(spansOf("a b c d e", 2) == Seq("a b", "c d", "e"))
    assert(spansOf("a b c d", 2) == Seq("a b", "c d"))
    assert(spansOf("a", 4) == Seq("a"))
  }

  test("spanChunks skips space runs and null text yields an empty array") {
    // deviation from the single-space tokenizer contract, documented at
    // spanPattern: space runs never form empty span members, and tokens
    // pair into a span only across a SINGLE space — a double space splits
    // the tiling (identical under Java regex and RE2, so the oracle agrees)
    assert(spansOf("a  b   c ", 2) == Seq("a", "b", "c"))
    assert(spansOf("", 2) == Seq.empty)
    val n = Seq((1L, Option.empty[String])).toDF("id", "t")
      .select(size(Text.spanChunks(col("t"), 2))).as[Int].head()
    assert(n == 0)
  }

  test("SortedLongSetContains: binary-search membership, null propagates") {
    val out = Seq[java.lang.Long](1L, 5L, 99L, null)
      .toDF("v")
      .select(LongSet.contains(col("v"), Array(5L, 1L, 42L)).as("m"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
    assert(out == Seq(true, true, false, null))
  }

  test("hotSpanScrub removes corpus-hot spans and keeps order (both paths)") {
    // "x1 x2 x3 x4" appears in 3 docs => hot at minCount=3; everything
    // else is unique. Doc 4 is fully hot; doc 5 is untouched.
    val docs = Seq(
      (1L, "x1 x2 x3 x4 a1 a2 a3 a4"),
      (2L, "b1 b2 b3 b4 x1 x2 x3 x4"),
      (3L, "c1 c2 c3 c4 x1 x2 x3 x4 d1 d2"),
      (4L, "x1 x2 x3 x4"),
      (5L, "e1 e2")).toDF("doc_id", "text")
    val expected = Seq(
      (1L, 2L, 1L, "a1 a2 a3 a4"),
      (2L, 2L, 1L, "b1 b2 b3 b4"),
      (3L, 3L, 1L, "c1 c2 c3 c4 d1 d2"),
      (4L, 1L, 1L, ""),
      (5L, 1L, 0L, "e1 e2"))
    for (ceiling <- Seq(1L << 20, 0L)) { // plan-literal path, then degrade
      val out = Text.hotSpanScrub(docs, "text", "doc_id",
          k = 4, minCount = 3L, maxBroadcastHot = ceiling)
        .orderBy("doc_id")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(out == expected, s"ceiling=$ceiling")
    }
  }

  test("hotSpanScrub: a span repeated 3x inside ONE doc is hot (multiplicity)") {
    // minCount counts occurrences, not distinct docs — self-repetition
    // is exactly the template spam the scrub exists for
    val docs = Seq(
      (1L, "p q p q p q"),
      (2L, "r s")).toDF("doc_id", "text")
    val out = Text.hotSpanScrub(docs, "text", "doc_id", k = 2, minCount = 3L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 3L, 3L, ""), (2L, 1L, 0L, "r s")))
  }

  private def tmpIndex(): String =
    java.nio.file.Files.createTempDirectory("graft-spanidx").toString + "/span_index"

  test("span-count index: install, append, refresh — hot trips on CROSS-generation totals") {
    val path = tmpIndex()
    // boiler span occurs twice in gen0, once in gen1 — hot only when summed
    val gen0 = Seq(
      (1L, "x1 x2 x3 x4 a1 a2 a3 a4"),
      (2L, "x1 x2 x3 x4 b1 b2 b3 b4")).toDF("doc_id", "text")
    val gen1 = Seq((3L, "x1 x2 x3 x4 c1 c2 c3 c4")).toDF("doc_id", "text")
    Dedup.writeSpanCountIndex(gen0, path, k = 4, minCount = 3L)
    assert(Dedup.spanCountIndexReadable(spark, path))
    assert(Dedup.readSpanLayout(spark, path) == ((4, 3L)))
    // no refresh yet: the list is empty, not an error
    assert(Dedup.readHotSpanList(spark, path).count() == 0)
    Dedup.refreshHotSpanList(spark, path)
    assert(Dedup.readHotSpanList(spark, path).count() == 0) // 2 < 3
    assert(Dedup.appendSpanCounts(gen1, path, generation = 1L))
    assert(!Dedup.appendSpanCounts(gen1, path, generation = 1L)) // replay no-op
    Dedup.refreshHotSpanList(spark, path)
    val hot = Dedup.readHotSpanList(spark, path).as[Long].collect().toSeq
    val boilerHash = Seq("x1 x2 x3 x4").toDF("ch")
      .select(Dedup.tokenHash64(col("ch"))).as[Long].head()
    assert(hot == Seq(boilerHash))
  }

  test("span-count index: fold preserves totals; a post-swap leftover generation cannot double-count") {
    val path = tmpIndex()
    val gen0 = Seq((1L, "x1 x2 x3 x4 a1 a2 a3 a4")).toDF("doc_id", "text")
    val gen1 = Seq((2L, "x1 x2 x3 x4 b1 b2 b3 b4")).toDF("doc_id", "text")
    val gen2 = Seq((3L, "x1 x2 x3 x4 c1 c2 c3 c4")).toDF("doc_id", "text")
    Dedup.writeSpanCountIndex(gen0, path, k = 4, minCount = 3L)
    Dedup.appendSpanCounts(gen1, path, 1L)
    Dedup.appendSpanCounts(gen2, path, 2L)
    Dedup.refreshHotSpanList(spark, path)
    val before = Dedup.readHotSpanList(spark, path).as[Long].collect().toSeq.sorted
    assert(before.nonEmpty)
    Dedup.compactSpanCountIndex(spark, path, upToGen = 2L)
    val counts = new java.io.File(new java.net.URI("file://" + path + "/counts").getPath)
    assert(counts.listFiles().count(_.getName.startsWith("batch=")) == 1)
    // simulate the fold's post-swap crash window: a stale original
    // generation still on disk next to the consolidated one — its rows are
    // (h, src, c) facts the reader's distinct removes, so totals hold
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$path/counts/batch=2"), fs,
      new org.apache.hadoop.fs.Path(s"$path/counts/batch=1"), false,
      spark.sparkContext.hadoopConfiguration)
    Dedup.refreshHotSpanList(spark, path)
    assert(Dedup.readHotSpanList(spark, path).as[Long].collect().toSeq.sorted == before)
  }

  test("scrubAgainstHotList rewrites text in place on both paths, other columns intact") {
    val path = tmpIndex()
    val corpus = Seq(
      (1L, "x1 x2 x3 x4 a1 a2 a3 a4"),
      (2L, "x1 x2 x3 x4 b1 b2 b3 b4"),
      (3L, "x1 x2 x3 x4 c1 c2 c3 c4")).toDF("doc_id", "text")
    Dedup.writeSpanCountIndex(corpus, path, k = 4, minCount = 3L)
    Dedup.refreshHotSpanList(spark, path)
    val hot = Dedup.readHotSpanList(spark, path)
    val batch = Seq(
      (10L, "x1 x2 x3 x4 d1 d2 d3 d4", "keep-me"),
      (11L, "x1 x2 x3 x4", "and-me"), // fully hot -> ''
      (12L, "e1 e2 e3 e4 e5", "me-too")).toDF("doc_id", "text", "extra")
    val expected = Seq(
      (10L, "d1 d2 d3 d4", "keep-me"),
      (11L, "", "and-me"),
      (12L, "e1 e2 e3 e4 e5", "me-too"))
    for (ceiling <- Seq(1L << 20, 0L)) {
      val out = Text.scrubAgainstHotList(batch, "text", "doc_id", 4, hot, ceiling)
        .select("doc_id", "text", "extra").orderBy("doc_id")
        .as[(Long, String, String)].collect().toSeq
      assert(out == expected, s"ceiling=$ceiling")
    }
    // empty list: zero spans removed, but the text still re-renders
    // single-spaced — rendering must not depend on WHEN the list arms, or
    // the same multi-spaced doc would fingerprint differently across the
    // arming boundary for a reason unrelated to hot spans
    val multiSpaced = Seq((20L, "g1  g2 g3", "w")).toDF("doc_id", "text", "extra")
    val none = Text.scrubAgainstHotList(
      batch.unionByName(multiSpaced), "text", "doc_id", 4, hot.filter(lit(false)))
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(none ==
      batch.orderBy("doc_id").as[(Long, String, String)].collect().toSeq :+
        ((20L, "g1 g2 g3", "w")))
  }

  test("dropRepeatedSpans keeps first occurrences in order") {
    val out = Text.dropRepeatedSpans(
        Seq(
          (1L, "a b c d a b e f a b"),
          (2L, "u v w"),
          (3L, "k k k k")).toDF("doc_id", "text"),
        "text", "doc_id", k = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // doc 1 spans: [a b][c d][a b][e f][a b] -> drop 2 later "a b"
    // doc 3 spans: [k k][k k] -> drop 1
    assert(out == Seq(
      (1L, 5L, 2L, "a b c d e f"),
      (2L, 2L, 0L, "u v w"),
      (3L, 2L, 1L, "k k")))
  }
}
