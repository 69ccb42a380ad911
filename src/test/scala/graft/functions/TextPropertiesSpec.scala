package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Property-based invariants for the round-4 text operators: randomized
  * corpora (not hand-picked fixtures) must uphold the algebraic contracts.
  * Spark-per-case is slow, so cases are few and small — the point is shape
  * coverage (empty docs, short docs, heavy repetition), not volume.
  */
class TextPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val token: Gen[String] = Gen.oneOf((1 to 12).map(i => s"t$i"))
  private val doc: Gen[String] =
    Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))
  private val corpus: Gen[Seq[(Long, String)]] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, doc)).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong, t)
    })

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: salted winnowing equals the single-window form on random corpora") {
    check(Prop.forAll(corpus) { rows =>
      val df = rows.toDF("doc_id", "text")
      val plain = Text.winnowFingerprints(df, "text", "doc_id")
        .as[(Long, Long)].collect().toSet
      val salted = Text.winnowFingerprintsSalted(df, "text", "doc_id", chunkSize = 4)
        .as[(Long, Long)].collect().toSet
      salted == plain
    })
  }

  test("property: boilerplateStats counts bounded, keep consistent, gram totals exact") {
    check(Prop.forAll(corpus) { rows =>
      val df = rows.toDF("doc_id", "text")
      val out = Text.boilerplateStats(df, "text", "doc_id",
          n = 3, dfThreshold = 2L, maxRatioE4 = 5000L)
        .as[(Long, Long, Long, Long, Long)].collect()
      val gramCount = rows.map { case (id, t) =>
        id -> math.max(0, t.split(" ").count(_.nonEmpty) - 2)
      }.toMap
      out.forall { case (id, nGrams, nBoiler, e4, keep) =>
        0L <= nBoiler && nBoiler <= nGrams &&
          // n_grams is exactly the doc's token count minus (n-1)
          nGrams == gramCount(id) &&
          // the flag is a pure function of the emitted score
          keep == (if (e4 <= 5000L) 1L else 0L) &&
          // basis points live in [0, 10000]
          0L <= e4 && e4 <= 10000L
      } &&
        // docs with fewer than n tokens emit no row; everything else does
        out.map(_._1).toSet == gramCount.filter(_._2 > 0).keySet
    })
  }

  // single-spaced reference tiling: what spanChunks must produce on the
  // generator's (always single-spaced) documents
  private def tiles(t: String, k: Int): Seq[String] =
    if (t.isEmpty) Seq.empty
    else t.split(" ").filter(_.nonEmpty).grouped(k).map(_.mkString(" ")).toSeq

  test("property: span tiling reassembles the document exactly, for every k") {
    check(Prop.forAll(corpus, Gen.choose(1, 5)) { (rows, k) =>
      val out = rows.toDF("doc_id", "text")
        .select(org.apache.spark.sql.functions.concat_ws(" ",
          Text.spanChunks(org.apache.spark.sql.functions.col("text"), k)))
        .as[String].collect().toSeq
      out == rows.map(_._2)
    })
  }

  test("property: dropRepeatedSpans equals the sequential first-occurrence reference") {
    check(Prop.forAll(corpus, Gen.choose(1, 4)) { (rows, k) =>
      val out = Text.dropRepeatedSpans(rows.toDF("doc_id", "text"), "text", "doc_id", k)
        .orderBy("doc_id")
        .as[(Long, Long, Long, String)].collect().toSeq
      val expected = rows.sortBy(_._1).map { case (id, t) =>
        val sp = tiles(t, k)
        val kept = sp.distinct // Scala distinct = first-occurrence order
        (id, sp.size.toLong, (sp.size - kept.size).toLong, kept.mkString(" "))
      }
      out == expected
    })
  }

  test("property: scrubAgainstHotList literal and degrade paths agree on random corpora and hot lists") {
    // the refactored two-path rewrite (review pass): for any corpus and any
    // hot-hash list — including empty and corpus-foreign hashes — the
    // plan-literal filter and the explode/anti-join/reassembly produce
    // byte-identical rewritten text
    check(Prop.forAll(corpus, Gen.choose(1, 3), Gen.choose(0, 4)) { (rows, k, nHot) =>
      val df = rows.toDF("doc_id", "text")
      val spans = rows.flatMap { case (_, t) => tiles(t, k) }.distinct
      val hotStrings = spans.take(nHot) :+ "not in any doc"
      val hot = hotStrings.toDF("ch")
        .select(Dedup.tokenHash64(org.apache.spark.sql.functions.col("ch")).as("h"))
      Seq(1L << 20, 0L).map { ceiling =>
        Text.scrubAgainstHotList(df, "text", "doc_id", k, hot, ceiling)
          .orderBy("doc_id").select("doc_id", "text")
          .as[(Long, String)].collect().toSeq
      } match { case Seq(a, b) => a == b }
    })
  }

  test("property: hotSpanScrub equals the count-threshold reference on BOTH paths") {
    check(Prop.forAll(corpus, Gen.choose(1, 3), Gen.choose(2L, 4L)) { (rows, k, minCount) =>
      val sp = rows.map { case (id, t) => id -> tiles(t, k) }
      val counts = sp.flatMap(_._2).groupBy(identity).map { case (c, o) => c -> o.size }
      val hot = counts.filter(_._2 >= minCount).keySet
      val expected = rows.sortBy(_._1).map { case (id, t) =>
        val s = tiles(t, k)
        val kept = s.filterNot(hot)
        (id, s.size.toLong, (s.size - kept.size).toLong, kept.mkString(" "))
      }
      Seq(1L << 20, 0L).forall { ceiling => // plan-literal path, then degrade
        Text.hotSpanScrub(rows.toDF("doc_id", "text"), "text", "doc_id",
            k, minCount, maxBroadcastHot = ceiling)
          .orderBy("doc_id")
          .as[(Long, Long, Long, String)].collect().toSeq == expected
      }
    })
  }
}
