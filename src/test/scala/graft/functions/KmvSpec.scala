package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV distinct sketch: exact-below-k fallback, estimator arithmetic,
  * duplicate insensitivity, partition-invariance (the merge is the same
  * min-set under any split), and the report surface.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("below saturation the sketch IS the distinct count") {
    val summary = (1 to 20).map(i => s"v$i")
      .toDS().map(Dedup.tokenHash64Jvm).orderBy(rand(7)) // order-immune
      .as[Long]
      .select(new Kmv.Sketch(32).toColumn)
      .head()
    assert(summary.n_min == 20L && summary.kth == 0L && summary.estimate == 20L)
  }

  test("saturated estimator: (k-1) * floorDiv(2^60, kth), kth = the k-th min") {
    val hashes = (1 to 500).map(i => Dedup.tokenHash64Jvm(s"item$i"))
    val k = 32
    val expectedKth = hashes.distinct.sorted.apply(k - 1)
    val s = hashes.toDS().select(new Kmv.Sketch(k).toColumn).head()
    assert(s.n_min == k.toLong && s.kth == expectedKth)
    assert(s.estimate ==
      (k - 1).toLong * Math.floorDiv(1L << 60, expectedKth))
    // the estimate lands near truth (deterministic given the md5 values;
    // the bound is the sketch's ~1/sqrt(k-2) error with wide margin)
    assert(s.estimate > 250L && s.estimate < 1000L, s"estimate=${s.estimate}")
  }

  test("duplicates and partitioning do not move the sketch") {
    val base = (1 to 300).map(i => s"d$i")
    val dup = (base ++ base ++ base.take(50)).toDS()
      .map(Dedup.tokenHash64Jvm)
    val one = dup.coalesce(1).select(new Kmv.Sketch(16).toColumn).head()
    val many = dup.repartition(13).select(new Kmv.Sketch(16).toColumn).head()
    val plain = base.toDS().map(Dedup.tokenHash64Jvm)
      .select(new Kmv.Sketch(16).toColumn).head()
    assert(one == many && one == plain)
  }

  test("distinctReport: exact, sketch and error columns agree with a by-hand check") {
    val df = Seq(
      ("en", "alpha"), ("en", "beta"), ("en", "alpha"),
      ("de", "gamma"), ("de", "delta"), ("de", "epsilon"), ("de", "gamma"))
      .toDF("lang", "text")
    val rows = Kmv.distinctReport(df, "lang", "text", k = 32)
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      ("de", 4L, 3L, 3L, 0L, 3L, 0L),
      ("en", 3L, 2L, 2L, 0L, 2L, 0L)))
    val sat = Kmv.distinctReport(
      spark.range(200).select(lit("xx").as("lang"),
        concat(lit("t"), col("id")).as("text")),
      "lang", "text", k = 8).head()
    assert(sat.getLong(3) == 8L) // saturated
    assert(sat.getLong(6) > 0L) // a real (reported) relative error
  }

  test("k under 2 is refused") {
    val e = intercept[IllegalArgumentException](new Kmv.Sketch(1))
    assert(e.getMessage.contains("k must be"))
  }
}
