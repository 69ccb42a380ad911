package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("host and registrable-domain extraction") {
    val out = Seq(
      "https://news.site7.example.com/p/1?x=2",
      "http://example.org/",
      "ftp://files.example.net",
      "https://hub.example.com#frag",
      "not a url").toDF("url")
      .select(UrlOps.host(col("url")).as("h"))
      .withColumn("d", UrlOps.registrableDomain(col("h")))
      .as[(String, String)].collect().toSeq
    assert(out == Seq(
      ("news.site7.example.com", "example.com"),
      ("example.org", "example.org"),
      ("files.example.net", "example.net"),
      ("hub.example.com", "example.com"),
      ("", "")))
  }

  private def corpus = {
    // host "big" holds 40 docs, "mid" 10, twenty "tN" hosts 2 each
    val rows =
      (0L until 40L).map(i => (i, "big")) ++
      (40L until 50L).map(i => (i, "mid")) ++
      (50L until 90L).map(i => (i, s"t${i % 20}"))
    rows.toDF("doc_id", "host")
  }

  test("capPerDomain caps only confirmed-heavy hosts; tail passes untouched") {
    val out = UrlOps.capPerDomain(corpus, "host", "doc_id", cap = 8, capacity = 12)
    val counts = out.groupBy("host").count().as[(String, Long)].collect().toMap
    assert(counts("big") == 8L, "heavy host capped")
    assert(counts("mid") == 8L, "mid host above cap is capped too")
    assert((0 until 20).forall(i => counts(s"t$i") == 2L), "tail untouched")
  }

  test("the carve is content-stable: repartitions and replays keep the same docs") {
    val a = UrlOps.capPerDomain(corpus, "host", "doc_id", 8, 12, "s1")
      .orderBy("host", "doc_id").as[(Long, String)].collect().toSeq
    val b = UrlOps.capPerDomain(corpus.repartition(7), "host", "doc_id", 8, 12, "s1")
      .orderBy("host", "doc_id").as[(Long, String)].collect().toSeq
    assert(a == b)
    // a different salt draws a different sample of the heavy host
    val c = UrlOps.capPerDomain(corpus, "host", "doc_id", 8, 12, "s2")
      .orderBy("host", "doc_id").as[(Long, String)].collect().toSeq
    assert(a != c)
    // ... but the same per-host sizes
    assert(a.groupBy(_._2).view.mapValues(_.size).toMap ==
      c.groupBy(_._2).view.mapValues(_.size).toMap)
  }

  test("capPerDomainAuto derives a lossless capacity and matches the exact rule") {
    val kept = UrlOps.capPerDomainAuto(corpus, "host", "doc_id", cap = 8, salt = "x")
      .orderBy("host", "doc_id").as[(Long, String)].collect().toSeq
    // exact reference: windowed rank over EVERY host (no sketch) — tail
    // hosts hold fewer than cap docs, so ranking them is a no-op and the
    // global window IS the exact cap rule
    val exact = Sampling.takePerStratum(corpus, "doc_id", "host", 8, "x")
      .orderBy("host", "doc_id").as[(Long, String)].collect().toSeq
    assert(kept == exact)
  }

  test("no heavy host -> input unchanged (no window shuffle at all)") {
    val tailOnly = (0L until 30L).map(i => (i, s"h${i % 15}")).toDF("doc_id", "host")
    val out = UrlOps.capPerDomain(tailOnly, "host", "doc_id", cap = 5, capacity = 8)
    assert(out.count() == 30L)
  }

  test("domainStats reports capped flags") {
    val st = UrlOps.domainStats(corpus, "host", cap = 8)
      .filter(col("capped") === 1L)
      .select("host").as[String].collect().toSet
    assert(st == Set("big", "mid"))
  }

  test("capPerDomainExact equals the sketch path doc for doc — zero driver state") {
    val viaSketch = UrlOps.capPerDomain(corpus, "host", "doc_id", 8, 12, "s1")
      .orderBy("host", "doc_id").as[(Long, String)].collect().toSeq
    val viaExact = UrlOps.capPerDomainExact(corpus, "host", "doc_id", 8, "s1")
      .orderBy("host", "doc_id").as[(Long, String)].collect().toSeq
    assert(viaExact == viaSketch)
  }

  test("an over-budget auto capacity degrades to the exact path with the identical result") {
    // maxCapacity 16 < ceil(90/2) = 45: the lossless sketch would need
    // more counters than the envelope allows, so auto must route to the
    // distributed exact path — and the kept set must not change
    val viaAuto = UrlOps.capPerDomainAuto(
        corpus, "host", "doc_id", cap = 2, salt = "x", maxCapacity = 16)
      .orderBy("host", "doc_id").as[(Long, String)].collect().toSeq
    val reference = UrlOps.capPerDomainAuto(corpus, "host", "doc_id", cap = 2, salt = "x")
      .orderBy("host", "doc_id").as[(Long, String)].collect().toSeq
    assert(viaAuto == reference)
    assert(viaAuto.count(_._2 == "big") == 2 && viaAuto.count(_._2 == "mid") == 2)
  }

  test("null hosts ride the tail branch untouched on both paths") {
    val withNulls = corpus.unionByName(
      Seq((900L, null: String), (901L, null: String)).toDF("doc_id", "host"))
    val viaSketch = UrlOps.capPerDomain(withNulls, "host", "doc_id", 8, 12, "s1")
    val viaExact = UrlOps.capPerDomainExact(withNulls, "host", "doc_id", 8, "s1")
    for (out <- Seq(viaSketch, viaExact)) {
      val nulls = out.filter(col("host").isNull)
        .select("doc_id").as[Long].collect().toSet
      assert(nulls == Set(900L, 901L), "uncappable rows must pass through")
    }
    assert(viaSketch.count() == viaExact.count())
  }
}
