package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.agg.BatchAggregates

class EventsPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: (java.lang.Long, String, Timestamp, Long, Double, String)*) =
    rows.toDF("event_id", "event_type", "ts", "user_id", "value", "props")

  private val t0 = Timestamp.valueOf("2024-03-06 12:30:00") // a Wednesday

  test("enrich: taxonomy, tiers, region, calendar, score, flag, doc_id") {
    val df = mkEvents((1L: java.lang.Long, "click", t0, 3L, 120.0, """{"k": 40}"""))
    val r = EventsPipeline.enrich(df).select(
      "event_type_clean", "category", "value_tier", "region", "dow", "month", "quarter",
      "k", "score", "is_high_value", "doc_id")
      .as[(String, String, String, String, Int, Int, Int, Int, Double, Boolean, String)].head()
    assert(r == (("CLICK", "Engagement", "T4_TOP", "North America", 3, 3, 1, 40, 300.0, true, "CLICK_1")))
  }

  test("enrich drops invalid rows (null id, empty type)") {
    val df = mkEvents(
      (1L: java.lang.Long, "click", t0, 1L, 1.0, "{}"),
      (null.asInstanceOf[java.lang.Long], "click", t0, 1L, 1.0, "{}"),
      (2L: java.lang.Long, "  ", t0, 1L, 1.0, "{}"))
    assert(EventsPipeline.enrich(df).count() == 1)
  }

  test("category ladder is total: unknown types fall to Other") {
    val df = mkEvents((1L: java.lang.Long, "mystery", t0, 2L, 10.0, """{"k": 0}"""))
    val r = EventsPipeline.enrich(df).select("category", "region", "score").as[(String, String, Double)].head()
    assert(r == (("Other", "Other", 0.0))) // k=0 -> guarded ratio 0
  }

  test("dimensionStats: conditional sum and null-safe stddev") {
    val df = mkEvents(
      (1L: java.lang.Long, "click", t0, 1L, 10.0, """{"k": 2}"""),
      (2L: java.lang.Long, "click", t0, 1L, 30.0, """{"k": 3}"""))
    val enriched = EventsPipeline.enrich(df)
    val r = BatchAggregates.dimensionStats(enriched, Seq("event_type_clean"), "value", col("k") % 2 === 0)
      .select("event_type_clean", "cnt", "avg_val", "min_val", "max_val", "stddev_val", "flag_cnt")
      .as[(String, Long, Double, Double, Double, Double, Long)].head()
    assert(r._1 == "CLICK" && r._2 == 2L && r._3 == 20.0 && r._4 == 10.0 && r._5 == 30.0 && r._7 == 1L)
  }

  test("percentileStats: exact quartiles") {
    val df = mkEvents((1 to 5).map(i =>
      (i.toLong: java.lang.Long, "click", t0, 1L, i * 10.0, """{"k": 1}""")): _*)
    val r = BatchAggregates.percentileStats(EventsPipeline.enrich(df), Seq("category"), "value")
      .select("p25", "p50", "p75").as[(Double, Double, Double)].head()
    assert(r == ((20.0, 30.0, 40.0)))
  }
}
