package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("splitLabel is a pure function of the key and covers all three splits") {
    val df = (0L until 1000L).toDF("id")
    val once = df.select(col("id"), Sampling.splitLabel(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    val twice = df.orderBy(col("id").desc).repartition(7)
      .select(col("id"), Sampling.splitLabel(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(once == twice) // layout-independent
    val dist = once.values.groupBy(identity).view.mapValues(_.size).toMap
    // 80/10/10 within generous tolerance on 1000 keys
    assert(dist("train") > 700 && dist("val") > 50 && dist("test") > 50, dist.toString)
  }

  test("sampleByHash keeps a stable subset") {
    val df = (0L until 500L).toDF("id")
    val s10 = Sampling.sampleByHash(df, "id", 10).as[Long].collect().toSet
    val s20 = Sampling.sampleByHash(df, "id", 20).as[Long].collect().toSet
    assert(s10.subsetOf(s20)) // nested by construction
    assert(s10.nonEmpty && s20.size < 200)
  }
}
