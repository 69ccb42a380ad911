package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 30% of facts on one hot key — the reference-analog company skew
  private def facts(n: Int) = (0L until n.toLong).map { i =>
    val k = if (i % 10 < 3) "MEGACORP" else s"co_${i % 50}"
    (i, k, i % 97)
  }.toDF("id", "company", "v")

  private def dim(extra: Boolean) = {
    val base = (0 until 50).map(i => (s"co_$i", i % 7L)) :+ (("MEGACORP", 9L))
    (if (extra) base :+ (("co_unmatched", 8L)) else base).toDF("company", "region")
  }

  test("saltedJoin is row-identical to the plain join, inner and left, skew and all") {
    val f = facts(3000)
    // drop some dim rows so LEFT has real null-region output
    val d = dim(extra = false).filter(col("region") =!= 3L)
    Seq("inner", "left").foreach { jt =>
      val plain = f.join(d, Seq("company"), jt)
        .select("id", "company", "v", "region").orderBy("id").collect().toSeq
      val salted = SkewJoin.saltedJoin(f, d, "company", col("id"), salts = 16, joinType = jt)
        .select("id", "company", "v", "region").orderBy("id").collect().toSeq
      assert(salted == plain, s"$jt diverged: ${salted.size} vs ${plain.size}")
    }
  }

  test("left_semi and left_anti never duplicate facts across dim replicas") {
    val f = facts(1000)
    val d = dim(extra = false).filter(col("company") =!= "MEGACORP")
    val semi = SkewJoin.saltedJoin(f, d, "company", col("id"), 8, "left_semi")
    val anti = SkewJoin.saltedJoin(f, d, "company", col("id"), 8, "left_anti")
    assert(semi.count() == 700L && anti.count() == 300L)
    assert(semi.select("id").distinct().count() == 700L)
  }

  test("right/full outer are rejected — dim replication would duplicate unmatched rows") {
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(facts(10), dim(true), "company", col("id"), 4, "full_outer")
    }
    assert(e.getMessage.contains("duplicate unmatched dim rows"))
  }

  test("under no-broadcast the exchanges are keyed on (key, salt): the hot key splits structurally") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val f = facts(5000)
      val joined = SkewJoin.saltedJoin(f, dim(false), "company", col("id"), salts = 16)
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
      assert(exchanges.nonEmpty, plan.take(600))
      assert(exchanges.forall(l => l.contains("company") && l.contains("__graft_salt")),
        s"join exchanges must carry the salt:\n${exchanges.mkString("\n")}")
      // the hot key's rows actually spread: 16 distinct salts drawn
      val spread = f.filter(col("company") === "MEGACORP")
        .select(pmod(xxhash64(col("id")), lit(16L)).cast("int").as("s"))
        .distinct().count()
      assert(spread == 16L, s"hot key drew only $spread salts")
      assert(joined.count() == 5000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
