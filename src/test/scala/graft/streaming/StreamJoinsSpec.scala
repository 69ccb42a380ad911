package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-static join enriches each micro-batch against a broadcast dim") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val joined = StreamJoins.enrichWithStatic(
      stream.toDF().toDF("user_id", "value"), dim, Seq("user_id"))
    val q = joined.writeStream.format("memory").queryName("ss_static").outputMode("append").start()
    try {
      stream.addData((1L, 10.0), (3L, 5.0)) // 3 has no dim row
      q.processAllAvailable()
      val rows = spark.table("ss_static")
        .select("user_id", "tier").as[(Long, Option[String])].collect().toSet
      assert(rows == Set((1L, Some("gold")), (3L, None)))
    } finally q.stop()
  }

  test("stream-stream band join matches click to impression within the band only") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.joinWithinBand(
      imps.toDF().toDF("imp_user", "imp_ts"),
      clicks.toDF().toDF("click_user", "click_ts"),
      "imp_user", "click_user", "imp_ts", "click_ts",
      band = "'10' MINUTE", watermark = "20 minutes")
    val q = joined.writeStream.format("memory").queryName("ss_band").outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
      clicks.addData(
        (1L, ts("2024-01-01 10:05:00")),  // within band -> match
        (2L, ts("2024-01-01 10:30:00")))  // outside band -> no match
      q.processAllAvailable()
      val rows = spark.table("ss_band").select("imp_user").as[Long].collect().toSeq
      assert(rows == Seq(1L))
    } finally q.stop()
  }
}
