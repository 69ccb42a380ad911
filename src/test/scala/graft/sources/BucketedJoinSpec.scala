package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Evidence for the PLANS.md claim that bucketing both fact tables on the
  * join key removes the join shuffle entirely — the 100 TB co-located-join
  * path needs no query-code change, only catalog layout.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed+sorted tables sort-merge join with no Exchange") {
    val wh = Files.createTempDirectory("graft-bucket").toString
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
        .write.option("path", s"$wh/t1").bucketBy(4, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_bucket_t1")
      (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "rv")
        .write.option("path", s"$wh/t2").bucketBy(4, "k").sortBy("k")
        .mode("overwrite").saveAsTable("graft_bucket_t2")
      val joined = spark.table("graft_bucket_t1").join(spark.table("graft_bucket_t2"), "k")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n${plan.take(800)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_t1")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_t2")
    }
  }
}
