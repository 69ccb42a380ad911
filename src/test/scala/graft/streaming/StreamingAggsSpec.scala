package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** Streaming semantics tests (SURVEY §2.8 W1-W8) with MemoryStream —
  * replacing the reference's console-sink eyeballing
  * (reference: bigdata-project/src/spark_streaming_v2.py:364-369).
  */
class StreamingAggsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def withQuery[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("tumbling window update-mode aggregation over a memory stream") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingAggs.tumblingStats(df, "ts", "1 hour", Seq("event_type"), "value",
      watermark = Some("10 minutes"))
    val q = agg.writeStream.format("memory").queryName("tumbling_t").outputMode("update").start()
    withQuery(q) {
      stream.addData(
        (ts("2024-01-01 10:05:00"), "click", 10.0),
        (ts("2024-01-01 10:40:00"), "click", 30.0),
        (ts("2024-01-01 10:10:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_t")
        .select("window_start", "event_type", "cnt", "avg_val", "doc_id")
        .as[(String, String, Long, Double, String)].collect().toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "click", 2L, 20.0, "click_2024-01-01 10:00:00"),
        ("2024-01-01 10:00:00", "view", 1L, 5.0, "view_2024-01-01 10:00:00")))
    }
  }

  test("watermark drops events later than the allowed lateness") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingAggs.tumblingStats(df, "ts", "1 hour", Seq("event_type"), "value",
      watermark = Some("10 minutes"))
    val q = agg.writeStream.format("memory").queryName("late_t").outputMode("update").start()
    withQuery(q) {
      stream.addData((ts("2024-01-01 10:05:00"), "click", 10.0))
      q.processAllAvailable()
      // advance event time far enough that the 10:00 window is below watermark
      stream.addData((ts("2024-01-01 12:30:00"), "click", 1.0))
      q.processAllAvailable()
      // this event is 2.5h late: must be dropped, not re-update the 10:00 window
      stream.addData((ts("2024-01-01 10:20:00"), "click", 99.0))
      q.processAllAvailable()
      val w10 = spark.table("late_t")
        .filter($"window_start" === "2024-01-01 10:00:00" && $"event_type" === "click")
        .select("cnt").as[Long].collect()
      assert(w10.forall(_ == 1L), s"late event leaked into closed window: ${w10.mkString(",")}")
    }
  }

  test("sliding window assigns each event to window/slide overlapping windows") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val df = stream.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingAggs.slidingCounts(df, "ts", "1 hour", "30 minutes", Seq("event_type"))
    val q = agg.writeStream.format("memory").queryName("sliding_t").outputMode("complete").start()
    withQuery(q) {
      stream.addData((ts("2024-01-01 10:45:00"), "click", 1.0))
      q.processAllAvailable()
      val starts = spark.table("sliding_t").select("window_start").as[String].collect().toSet
      assert(starts == Set("2024-01-01 10:00:00", "2024-01-01 10:30:00"))
    }
  }

  test("stateful window state survives crash/restart under both HDFS and RocksDB stores") {
    // The real state-store soak: an append-mode watermarked window keeps its
    // OPEN window's partial aggregate only in the state store. Kill the
    // query before the window finalizes, restart from the checkpoint, then
    // advance the watermark — the emitted window must contain the
    // pre-crash events, proving the state was recovered from the provider.
    val providers = Seq(
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      graft.GraftSession.RocksDbProvider)
    for (provider <- providers) {
      val s = spark.newSession()
      s.conf.set(graft.GraftSession.StateStoreProviderKey, provider)
      implicit val ctx = s.sqlContext
      val stream = MemoryStream[(Timestamp, String, Double)]
      val dir = java.nio.file.Files.createTempDirectory("state_soak").toString
      def start(): StreamingQuery = StreamingAggs
        .tumblingStats(stream.toDF().toDF("ts", "event_type", "value"),
          "ts", "1 hour", Seq("event_type"), "value", watermark = Some("10 minutes"))
        .writeStream
        .format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append")
        .start()
      val q1 = start()
      withQuery(q1) {
        stream.addData(
          (ts("2024-01-01 10:05:00"), "click", 10.0),
          (ts("2024-01-01 10:40:00"), "click", 30.0))
        q1.processAllAvailable()
      } // "crash": the 10:00 window is still open — its partials live ONLY in state
      val q2 = start()
      withQuery(q2) {
        stream.addData((ts("2024-01-01 12:30:00"), "click", 1.0))
        q2.processAllAvailable() // watermark 12:20 > 11:00 finalizes the window
      }
      val rows = s.read.parquet(s"$dir/out")
        .filter(org.apache.spark.sql.functions.col("window_start") === "2024-01-01 10:00:00")
        .select("event_type", "cnt", "avg_val")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 20.0)), s"provider $provider got $rows")
    }
  }

  test("upsert doc_ids stay distinct for null-bearing dim groups") {
    // concat_ws silently SKIPS nulls, so (null,'x') and ('x',null) groups
    // would collide on one keyed-sink key and overwrite each other's
    // stats; null dims must render as an explicit token (review finding)
    val static = Seq(
      (ts("2024-01-01 10:05:00"), Option.empty[String], Some("x"), 1.0),
      (ts("2024-01-01 10:06:00"), Some("x"), Option.empty[String], 2.0))
      .toDF("ts", "d1", "d2", "value")
    val ids = StreamingAggs
      .tumblingStats(static, "ts", "1 hour", Seq("d1", "d2"), "value")
      .select("doc_id").as[String].collect().toSeq
    assert(ids.distinct.length == 2, s"null-dim groups collided: $ids")
    assert(ids.toSet == Set("null_x_2024-01-01 10:00:00", "x_null_2024-01-01 10:00:00"))
  }

  test("batch and streaming share one code path: same result on a static frame") {
    val static = Seq(
      (ts("2024-01-01 10:05:00"), "click", 10.0),
      (ts("2024-01-01 10:40:00"), "click", 30.0))
      .toDF("ts", "event_type", "value")
    val out = StreamingAggs.tumblingStats(static, "ts", "1 hour", Seq("event_type"), "value")
      .as[(String, String, Long, Double, String)].collect().toSeq
    assert(out == Seq(("2024-01-01 10:00:00", "click", 2L, 20.0, "click_2024-01-01 10:00:00")))
  }
}
