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

  test("ensureCustomerOrders: layout built once per (dir, buckets); a buckets change lands fresh tables") {
    val dir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-bucket-reuse").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
    def mtimes(sub: String): Map[String, Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/$sub"))
        .map(st => st.getPath.getName -> st.getModificationTime).toMap
    val (o1, c1) = Bucketing.ensureCustomerOrders(spark, dir, root, buckets = 4)
    try {
      val ordersDir = fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .map(_.getPath.getName).find(_.startsWith("orders_")).get
      val t0 = mtimes(ordersDir)
      // second consumer, same layout parameters: catalog hit, files untouched
      val (o2, c2) = Bucketing.ensureCustomerOrders(spark, dir, root, buckets = 4)
      assert((o2, c2) == (o1, c1))
      assert(mtimes(ordersDir) == t0, "a reuse call must not rewrite the layout")
      // a buckets-parameter change must NOT serve the stale 4-bucket layout
      // (the round-7 advice: tableExists alone couldn't see the parameter)
      val (o3, _) = Bucketing.ensureCustomerOrders(spark, dir, root, buckets = 2)
      assert(o3 != o1, "bucket count is part of the layout identity")
      val meta = spark.sql(s"DESCRIBE TABLE EXTENDED $o3").collect().map(_.mkString(" "))
      assert(meta.exists(l => l.contains("Num Buckets") && l.contains("2")),
        meta.filter(_.contains("Bucket")).mkString("\n"))
    } finally {
      Seq(4, 2).foreach { b =>
        spark.sql(s"DROP TABLE IF EXISTS graft_orders_bkt__root_testdata_sf0_001_b$b")
        spark.sql(s"DROP TABLE IF EXISTS graft_customer_bkt__root_testdata_sf0_001_b$b")
      }
    }
  }

  test("a surviving catalog entry with wiped backing files rebuilds instead of serving emptiness") {
    // the r15 advice scenario: the session catalog outlives a fixture-root
    // wipe; tableExists alone would then serve a data-less table to every
    // later consumer in the session
    val dir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("graft-bucket-wipe").toString
    val (o1, _) = Bucketing.ensureCustomerOrders(spark, dir, root, buckets = 4)
    try {
      assert(spark.table(o1).count() > 0)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(root), spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true) // the wipe
      val (o2, _) = Bucketing.ensureCustomerOrders(spark, dir, root, buckets = 4)
      assert(o2 == o1, "same layout identity, same catalog name")
      assert(spark.table(o2).count() > 0,
        "the catalog hit must be re-validated against the backing files")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS graft_orders_bkt__root_testdata_sf0_001_b4")
      spark.sql(s"DROP TABLE IF EXISTS graft_customer_bkt__root_testdata_sf0_001_b4")
    }
  }
}
