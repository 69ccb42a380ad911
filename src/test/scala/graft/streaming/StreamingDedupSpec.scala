package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dedupWithinWatermark drops in-batch and cross-batch duplicates inside the horizon") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.dedupWithinWatermark(
      stream.toDF().toDF("doc_id", "ts", "text"),
      keys = Seq("doc_id"), tsCol = "ts", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd_keys").outputMode("append").start()
    try {
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), "a"),
        (1L, ts("2024-01-01 10:00:30"), "a dup in batch"),
        (2L, ts("2024-01-01 10:01:00"), "b"))
      q.processAllAvailable()
      stream.addData((1L, ts("2024-01-01 10:02:00"), "a dup next batch"))
      q.processAllAvailable()
      val rows = spark.table("sd_keys").select("doc_id", "text")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "a"), (2L, "b")))
    } finally q.stop()
  }

  test("dedupDocStream passes null-text rows through (they carry no content key)") {
    // md5(null) is null and dropDuplicatesWithinWatermark groups null keys
    // as equal — two distinct null-text docs routed into the state store
    // would silently collapse into one, where the batch fp-index twin
    // admits both (null-safe joins never match on null; review finding)
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.dedupDocStream(
      stream.toDF().toDF("doc_id", "ts", "text"),
      textCol = "text", tsCol = "ts", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sd_null").outputMode("append").start()
    try {
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), null),
        (2L, ts("2024-01-01 10:00:10"), null),
        (3L, ts("2024-01-01 10:00:20"), "real words"),
        (4L, ts("2024-01-01 10:00:30"), "real words"))
      q.processAllAvailable()
      val rows = spark.table("sd_null").select("doc_id").as[Long].collect().toSet
      assert(rows == Set(1L, 2L, 3L), rows.toSeq.sorted.mkString(","))
    } finally q.stop()
  }

  test("dedupDocStream dedups on content, keeps the output schema, and distinct texts survive") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingDedup.dedupDocStream(
      stream.toDF().toDF("doc_id", "ts", "text"),
      textCol = "text", tsCol = "ts", watermark = "10 minutes")
    assert(out.columns.toSeq == Seq("doc_id", "ts", "text"), out.columns.mkString(","))
    val q = out.writeStream.format("memory").queryName("sd_text").outputMode("append").start()
    try {
      stream.addData(
        (1L, ts("2024-01-01 10:00:00"), "same words"),
        (2L, ts("2024-01-01 10:00:10"), "same words"),  // content dup, different id
        (3L, ts("2024-01-01 10:00:20"), "other words"))
      q.processAllAvailable()
      val rows = spark.table("sd_text").select("doc_id").as[Long].collect().toSet
      assert(rows == Set(1L, 3L))
    } finally q.stop()
  }
}
