package graft.ops

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Naive reference: cross join + exact predicate. The binned rewrite must
    * be row-for-row indistinguishable from this at ANY bin width.
    */
  private def naive(
      intervals: DataFrame,
      points: DataFrame,
      ik: String, pk: String,
      lo: String, hi: String, pt: String,
      incLo: Boolean, incHi: Boolean): Set[(Long, Long)] = {
    val loOk = if (incLo) col(pt) >= col(lo) else col(pt) > col(lo)
    val hiOk = if (incHi) col(pt) <= col(hi) else col(pt) < col(hi)
    intervals.join(points, col(ik) === col(pk) && loOk && hiOk)
      .select(col("iid"), col("pid")).as[(Long, Long)].collect().toSet
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("iid", "pid").as[(Long, Long)].collect().toSet

  test("binned join equals the naive inequality join across bin widths (property)") {
    val rnd = new Random(7)
    // sub-second offsets exercise the micros-precision path; spans from 0
    // (point intervals) to multiples of every tested bin width
    val base = ts("2024-03-01 00:00:00").getTime
    val intervals = (1L to 120L).map { i =>
      val start = base + rnd.nextInt(600000)
      (i, rnd.nextInt(4).toLong, new Timestamp(start),
        new Timestamp(start + rnd.nextInt(120000)))
    }.toDF("iid", "ikey", "lo", "hi")
    val points = (1L to 300L).map { p =>
      (p, rnd.nextInt(4).toLong, new Timestamp(base + rnd.nextInt(720000)))
    }.toDF("pid", "pkey", "pt")
    val expected = naive(intervals, points, "ikey", "pkey", "lo", "hi", "pt",
      incLo = true, incHi = true)
    assert(expected.nonEmpty, "degenerate fixture: no matches")
    for (w <- Seq(1L, 7L, 60L, 3600L)) {
      val got = pairs(RangeJoin.pointInInterval(
        intervals, points, Seq("ikey"), Seq("pkey"), "lo", "hi", "pt", binWidthSec = w))
      assert(got == expected, s"binWidthSec=$w diverged from the naive join")
    }
  }

  test("inclusive/exclusive bounds are honored at exact boundaries") {
    val intervals = Seq((1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("iid", "ikey", "lo", "hi")
    val points = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")), // == lo
      (11L, 1L, ts("2024-01-01 10:30:00")), // interior
      (12L, 1L, ts("2024-01-01 11:00:00"))) // == hi
      .toDF("pid", "pkey", "pt")
    def run(incLo: Boolean, incHi: Boolean) = pairs(RangeJoin.pointInInterval(
      intervals, points, Seq("ikey"), Seq("pkey"), "lo", "hi", "pt",
      binWidthSec = 1800, inclusiveLo = incLo, inclusiveHi = incHi)).map(_._2)
    assert(run(true, true) == Set(10L, 11L, 12L))
    assert(run(true, false) == Set(10L, 11L))
    assert(run(false, true) == Set(11L, 12L))
    assert(run(false, false) == Set(11L))
  }

  test("NULL keys/timestamps and empty intervals match nothing (SQL join semantics)") {
    val intervals = Seq(
      (1L, Some(1L), Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00"))),
      (2L, None: Option[Long], Some(ts("2024-01-01 10:00:00")), Some(ts("2024-01-01 11:00:00"))),
      (3L, Some(1L), None: Option[Timestamp], Some(ts("2024-01-01 11:00:00"))),
      (4L, Some(1L), Some(ts("2024-01-01 11:00:00")), Some(ts("2024-01-01 10:00:00")))) // lo > hi
      .toDF("iid", "ikey", "lo", "hi")
    val points = Seq(
      (10L, Some(1L), Some(ts("2024-01-01 10:30:00"))),
      (11L, None: Option[Long], Some(ts("2024-01-01 10:30:00"))), // null key
      (12L, Some(1L), None: Option[Timestamp])) // null ts
      .toDF("pid", "pkey", "pt")
    val got = pairs(RangeJoin.pointInInterval(
      intervals, points, Seq("ikey"), Seq("pkey"), "lo", "hi", "pt", binWidthSec = 60))
    assert(got == Set((1L, 10L)))
  }

  test("a runaway interval fails loudly instead of exploding the shuffle") {
    val intervals = Seq((1L, 1L, ts("2024-01-01 00:00:00"), ts("2024-12-31 00:00:00")))
      .toDF("iid", "ikey", "lo", "hi")
    val points = Seq((10L, 1L, ts("2024-06-01 00:00:00"))).toDF("pid", "pkey", "pt")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(intervals, points, Seq("ikey"), Seq("pkey"),
        "lo", "hi", "pt", binWidthSec = 1, maxBinsPerInterval = 1000).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("RangeJoin")), s"unexpected failure: $ex")
  }

  test("bandPairs equals the naive banded self-join, each unordered pair once (property)") {
    val rnd = new Random(11)
    val base = ts("2024-03-01 00:00:00").getTime
    val rows = (1L to 150L).map { i =>
      (i, rnd.nextInt(5).toLong, new Timestamp(base + rnd.nextInt(600000)))
    }.toDF("id", "key", "ts")
    val bandSec = 60L
    val naivePairs = rows.select(col("id").as("lid"), col("key").as("lkey"), col("ts").as("lts"))
      .join(rows.select(col("id").as("rid"), col("key").as("rkey"), col("ts").as("rts")),
        col("lkey") === col("rkey") && col("lid") < col("rid") &&
          abs(unix_micros(col("lts")) - unix_micros(col("rts"))) <= lit(bandSec * 1000000L))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(naivePairs.nonEmpty, "degenerate fixture: no pairs")
    for (w <- Seq(0L /* default = band */, 7L, 3600L)) {
      val got = RangeJoin.bandPairs(rows, Seq("key"), "id", "ts", bandSec, binWidthSec = w)
        .select(col("a_id"), col("b_id")).as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"binWidthSec=$w emitted a duplicate pair")
      assert(got.toSet == naivePairs, s"binWidthSec=$w diverged from the naive self-join")
    }
  }

  test("bandPairs band boundary is inclusive on both sides") {
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (2L, 1L, ts("2024-01-01 10:01:00")), // exactly +band from id 1
      (3L, 1L, ts("2024-01-01 10:02:01"))) // 61 s from id 2 -> out
      .toDF("id", "key", "ts")
    val got = RangeJoin.bandPairs(rows, Seq("key"), "id", "ts", bandSec = 60L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("overlapping column names are rejected up front") {
    val intervals = Seq((1L, 1L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("iid", "key", "lo", "hi")
    val points = Seq((10L, 1L, ts("2024-01-01 12:00:00"))).toDF("pid", "key", "pt")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(intervals, points, Seq("key"), Seq("key"),
        "lo", "hi", "pt", binWidthSec = 60)
    }
    assert(ex.getMessage.contains("overlap"))
  }
}
