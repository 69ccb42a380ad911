package graft.ops

import org.apache.spark.sql.functions.{col, size, split, when}

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packing matches a sequential per-shard reference packer") {
    // 200 docs with token counts 1..37, sharded 4 ways, 16-token windows:
    // the distributed window-function form must agree doc-for-doc with a
    // straightforward sequential packer run over each shard
    def nTokens(id: Long): Long = id % 37 + 1
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill(nTokens(i).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing
      .packSequences(docs, "text", "doc_id", budget = 16, shards = 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(out.size == 200)
    (0L until 4L).foreach { sh =>
      var cum = 0L
      (0L until 200L).filter(_ % 4 == sh).foreach { id =>
        val n = nTokens(id)
        val first = cum / 16
        val last = (cum + n - 1) / 16
        assert(out(id) == ((sh, n, first, last, last - first + 1)),
          s"doc $id: got ${out(id)} expected ($sh, $n, $first, $last, ${last - first + 1})")
        cum += n
      }
    }
  }

  test("every non-terminal window is filled to exactly the budget") {
    // stream packing's defining invariant: slicing the concatenated shard
    // stream leaves no gaps — every window before a shard's last holds
    // exactly `budget` tokens once straddling docs are split at boundaries
    val budget = 32L
    val docs = (0L until 300L)
      .map(i => (i, Seq.fill((i * 7 % 23 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Packing
      .packSequences(docs, "text", "doc_id", budget = budget.toInt, shards = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val fill = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    val cum = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    rows.sortBy { case (id, sh, _, _, _) => (sh, id) }.foreach {
      case (_, sh, n, first, last) =>
        val start = cum(sh)
        (first to last).foreach { w =>
          val lo = math.max(start, w * budget)
          val hi = math.min(start + n, (w + 1) * budget)
          fill((sh, w)) += hi - lo
        }
        cum(sh) = start + n
    }
    (0L until 2L).foreach { sh =>
      val lastWindow = (cum(sh) - 1) / budget
      (0L until lastWindow).foreach { w =>
        assert(fill((sh, w)) == budget, s"shard $sh window $w: ${fill((sh, w))}")
      }
      assert(fill((sh, lastWindow)) == cum(sh) - lastWindow * budget)
    }
  }

  test("string doc ids shard by hash instead of collapsing into one null shard") {
    val docs = (0 until 40)
      .map(i => (f"doc-$i%03d", Seq.fill(i % 7 + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.packSequences(docs, "text", "doc_id", budget = 16, shards = 4)
    assert(out.filter(col("shard").isNull).count() == 0,
      "non-numeric ids must hash-shard, not null-shard")
    // actually sharded (the old `id % n` sent every string id to one
    // serialized null partition)
    assert(out.select("shard").distinct().count() > 1)
    assert(out.filter(col("pack_last").isNull || col("n_windows").isNull).count() == 0)
  }

  test("null text budgets as zero tokens with a complete output row") {
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]), (3L, "d e"))
      .toDF("doc_id", "text")
    val rows = Packing.packSequences(docs, "text", "doc_id", budget = 16, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "pack_first", "pack_last", "n_windows")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 2 contributes nothing to the stream but emits a complete row
    assert(rows == Seq((1L, 3L, 0L, 0L, 1L), (2L, 0L, 0L, 0L, 1L), (3L, 2L, 0L, 0L, 1L)),
      rows.toString)
  }

  test("budget must be a power of two") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.packSequences(docs, "text", "doc_id", budget = 1000, shards = 2)
    }
  }

  test("packByCount budgets with the supplied column; null counts as zero") {
    // one shard, counts 3, null, 6: stream positions 0-2, (skip), 3-8
    // under budget 4 -> doc1 [0,0]; doc2 contributes nothing mid-window;
    // doc3 spans windows [0,2]
    val docs = Seq(
      (1L, java.lang.Long.valueOf(3L)),
      (2L, null: java.lang.Long),
      (3L, java.lang.Long.valueOf(6L))).toDF("doc_id", "cnt")
    val out = Packing.packByCount(docs, "cnt", "doc_id", budget = 4, shards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "pack_first", "pack_last", "n_windows")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 0L, 0L, 1L), (2L, 0L, 0L, 0L, 1L), (3L, 6L, 0L, 2L, 3L)),
      out.toString)
  }

  test("packSequences delegates to packByCount with whitespace counts (q75 parity)") {
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, null: String))
      .toDF("doc_id", "text")
    val a = Packing.packSequences(docs, "text", "doc_id", budget = 4, shards = 2)
      .orderBy("doc_id").collect().toSeq
    val b = Packing.packByCount(
      docs.withColumn("n", when(col("text").isNull, 0L)
        .otherwise(size(split(col("text"), " ")).cast("long"))),
      "n", "doc_id", budget = 4, shards = 2)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
