package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState keeps running per-key totals across micro-batches") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(String, Long)]
    val counts = StatefulOps.runningCounts(stream.toDS())
    val q = counts.writeStream.format("memory").queryName("running_t").outputMode("update").start()
    try {
      stream.addData(("a", 1L), ("a", 2L), ("b", 5L))
      q.processAllAvailable()
      stream.addData(("a", 10L))
      q.processAllAvailable()
      val rows = spark.table("running_t").as[StatefulOps.KeyCount].collect()
      // update mode: batch1 emitted a->3, b->5; batch2 emitted a->13
      assert(rows.filter(_.key == "a").map(_.total).sorted.toSeq == Seq(3L, 13L))
      assert(rows.filter(_.key == "b").map(_.total).toSeq == Seq(5L))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups keys across nearby micro-batches") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val df = stream.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = df.writeStream.format("memory").queryName("dedup_t").outputMode("append").start()
    try {
      stream.addData((1L, Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // same id within the watermark window -> suppressed
      stream.addData((1L, Timestamp.valueOf("2024-01-01 10:05:00")))
      q.processAllAvailable()
      stream.addData((2L, Timestamp.valueOf("2024-01-01 10:06:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup_t").select("id").as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }
}
