package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TemporalFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("epochMillisToDate and epochSecondsToTimestamp round-trip known instants") {
    val ms = 1704067200000L // 2024-01-01 00:00:00 UTC
    val out = Seq((ms, ms / 1000.0)).toDF("ms", "sec")
      .select(
        Temporal.epochMillisToDate(col("ms")).cast("string"),
        Temporal.epochSecondsToTimestamp(col("sec")).cast("string"))
      .as[(String, String)].head()
    assert(out == ("2024-01-01", "2024-01-01 00:00:00"))
  }

  test("dayOfWeekSun0 pins Sunday=0 (matches the DuckDB oracle convention)") {
    val out = Seq("2024-01-07", "2024-01-08", "2024-01-13") // Sun, Mon, Sat
      .toDF("d")
      .select(Temporal.dayOfWeekSun0(col("d").cast("date"))).as[Int].collect().toSeq
    assert(out == Seq(0, 1, 6))
  }

  test("freshness ladder buckets match the reference thresholds") {
    // reference spark_batch_v2.py:168-173 verbatim: <=1 Fresh, <=7 Recent,
    // <=30 Active, else Old (an earlier version drifted to <1/<=28)
    val out = Seq(Some(0), Some(1), Some(2), Some(7), Some(8), Some(30), Some(31), None)
      .toDF("days")
      .select(Temporal.freshness(col("days"))).as[String].collect().toSeq
    assert(out == Seq(
      "Fresh", "Fresh", "Recent", "Recent", "Active", "Active", "Old", "Unknown"))
    // reference-verbatim null handling: no Unknown branch, null -> Old
    val refNull = Seq(Option.empty[Int]).toDF("days")
      .select(Temporal.freshness(col("days"), nullLabel = None)).as[String].head()
    assert(refNull == "Old")
  }

  test("daysSince counts calendar days") {
    val out = Seq(("2024-03-10", "2024-03-01")).toDF("a", "b")
      .select(Temporal.daysSince(col("a").cast("date"), col("b").cast("date"))).as[Int].head()
    assert(out == 9)
  }

  test("guardedRatio: zero guard and the x100 scale") {
    val out = Seq((50.0, 100), (50.0, 0), (0.0, 100)).toDF("n", "d")
      .select(Features.guardedRatio(col("n"), col("d"))).as[Double].collect().toSeq
    assert(out == Seq(50.0, 0.0, 0.0))
  }

  test("highDemand flag") {
    val out = Seq((150.0, 3.0), (150.0, 10.0), (50.0, 3.0)).toDF("views", "score")
      .select(Features.highDemand(col("views"), col("score"), 100, 5)).as[Boolean].collect().toSeq
    assert(out == Seq(true, false, false))
  }

  test("imputeWithGlobalMean fills nulls with the mean of present values") {
    val df = Seq(Some(10.0), Some(30.0), None).toDF("v")
    val out = Features.imputeWithGlobalMean(df, "v", "filled")
      .select("filled").as[Double].collect().toSeq.sorted
    assert(out == Seq(10.0, 20.0, 30.0))
  }

  test("imputeWithJitter: fills with mean × U(0.8, 1.2), seed-deterministic") {
    // single partition so rand(seed)'s per-partition stream is pinned
    val df = Seq(Some(10.0), Some(30.0), None, None).toDF("v").coalesce(1)
    def run(seed: Long) = Features.imputeWithJitter(df, "v", "filled", seed)
      .select("filled").as[Double].collect().toSeq
    val a = run(7L)
    // present values untouched; filled values inside mean × [0.8, 1.2)
    assert(a.take(2) == Seq(10.0, 30.0))
    a.drop(2).foreach(v => assert(v >= 16.0 && v < 24.0))
    // exact reproducibility for a fixed seed, different draw per row
    assert(a == run(7L))
    assert(a.drop(2).distinct.size == 2)
    // a different seed draws a different jitter stream
    assert(a != run(8L))
  }
}
