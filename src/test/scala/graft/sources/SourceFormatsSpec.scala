package graft.sources

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sinks.Sinks

/** Coverage for the remaining source/sink inventory rows: S1 (JSON lake
  * scan with declared schema), S9/W9 (streaming micro-batched archiver),
  * S10 (map/reduce smoke pattern), W8 (awaitAnyTermination).
  */
class SourceFormatsSpec extends SparkSpec {
  import spark.implicits._

  test("S1: JSON lake scan with DECLARED schema; malformed rows become nulls") {
    val dir = Files.createTempDirectory("jsonlake").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part1.json"),
      """{"job_id":"a","views":3}
        |{"job_id":"b","views":"not-a-number"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("job_id", StringType), StructField("views", IntegerType)))
    val df = spark.read.schema(schema).json(dir)
    val rows = df.select("job_id", "views").collect()
    assert(rows.length == 2)
    val bad = df.filter($"job_id" === "b").head()
    assert(bad.isNullAt(bad.fieldIndex("views"))) // permissive mode nulls the field
  }

  test("S1: CSV lake scan routes malformed rows to quarantine, never drops them silently") {
    val dir = Files.createTempDirectory("csvlake").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("metric", LongType), StructField("flag", StringType)))
    Seq(
      "1,alpha,10,f1",
      "2,beta,xx,f0",      // type-invalid metric
      "3,gamma",           // short row
      "4,delta,40,f0,ex",  // extra field
      "5,eps,50,f1"
    ).toDF("value").repartition(2).write.text(s"$dir/csv")
    val raw = CsvLake.read(spark, s"$dir/csv", schema)
    val good = CsvLake.wellFormed(raw)
    assert(good.columns.toSeq == Seq("id", "name", "metric", "flag"))
    assert(good.orderBy("id").select("id").as[Long].collect().toSeq == Seq(1L, 5L))
    // all three malformation kinds land in quarantine WITH their raw lines
    val bad = CsvLake.quarantined(raw)
      .select(col(CsvLake.CorruptCol)).as[String].collect().toSet
    assert(bad == Set("2,beta,xx,f0", "3,gamma", "4,delta,40,f0,ex"))
    // accept + audit partition the file: nothing silently dropped
    assert(good.count() + bad.size == 5L)
    // the reserved corrupt column cannot be shadowed by the declared schema
    intercept[IllegalArgumentException] {
      CsvLake.read(spark, s"$dir/csv",
        StructType(schema.fields :+ StructField(CsvLake.CorruptCol, StringType)))
    }
  }

  test("S9/W9: streaming archiver lands date-partitioned parquet via trigger") {
    val dir = Files.createTempDirectory("arch").toString
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val df = stream.toDF().toDF("id", "payload", "event_date")
    val q = Sinks.streamingLakeWriter(
      df, "event_date", s"$dir/lake", s"$dir/ckpt", triggerInterval = "1 second").start()
    try {
      stream.addData((1L, "x", "2024-01-01"), (2L, "y", "2024-01-02"))
      q.processAllAvailable()
      // W8: multi-query orchestration entry point returns promptly when idle
      spark.streams.awaitAnyTermination(50)
    } finally q.stop()
    val back = spark.read.parquet(s"$dir/lake")
    assert(back.count() == 2)
    val dirs = new java.io.File(s"$dir/lake").listFiles().map(_.getName).filter(_.startsWith("event_date="))
    assert(dirs.toSet == Set("event_date=2024-01-01", "event_date=2024-01-02"))
    // partition pruning on read-back
    assert(Sinks.readLakePartition(spark, s"$dir/lake", "event_date", "2024-01-01").count() == 1)
  }

  test("S10: the reference's RDD parallelize/map/reduce demo as Dataset ops") {
    // reference: bigdata-project/k8s/job.py:24-35 squares 30 ints and sums
    val total = spark.range(1, 31).as[Long].map(x => x * x).reduce(_ + _)
    assert(total == (1 to 30).map(x => x * x).sum)
  }
}
