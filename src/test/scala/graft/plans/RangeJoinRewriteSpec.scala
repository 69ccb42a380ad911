package graft.plans

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The optimizer-rule contract: same SQL text, same rows, different join
  * shape. Each test runs on an isolated `newSession()` (conf changes must
  * not leak into the shared TestSpark session; extensions — and therefore
  * the injected rule — carry over to child sessions).
  */
class RangeJoinRewriteSpec extends SparkSpec {

  private def withBinWidth[A](widthSec: Long)(f: SparkSession => A): A = {
    val s = spark.newSession()
    s.conf.set(RangeJoinRewrite.WidthConf, widthSec.toString)
    f(s)
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  /** intervals(iid, ikey, lo, hi) and points(pid, pkey, pt) as temp views. */
  private def fixtures(s: SparkSession, seed: Int = 3): Unit = {
    val rnd = new Random(seed)
    val base = ts("2024-03-01 00:00:00").getTime
    import s.implicits._
    (1L to 80L).map { i =>
      val start = base + rnd.nextInt(600000)
      (i, rnd.nextInt(3).toLong, new Timestamp(start), new Timestamp(start + rnd.nextInt(90000)))
    }.toDF("iid", "ikey", "lo", "hi").createOrReplaceTempView("ivals")
    (1L to 200L).map { p =>
      (p, rnd.nextInt(3).toLong, new Timestamp(base + rnd.nextInt(700000)))
    }.toDF("pid", "pkey", "pt").createOrReplaceTempView("pts")
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] = {
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)
    df.select("iid", "pid").as(enc).collect().toSet
  }

  private val keylessSql =
    "SELECT iid, pid FROM ivals JOIN pts ON pt >= lo AND pt <= hi"
  private val keyedSql =
    "SELECT iid, pid FROM ivals JOIN pts ON ikey = pkey AND pt >= lo AND pt <= hi"

  test("keyless SQL inequality join: rewritten plan is nested-loop-free and row-identical") {
    // reference rows from the UNREWRITTEN plan on the shared session
    fixtures(spark)
    val expected = pairs(spark.sql(keylessSql))
    assert(expected.nonEmpty, "degenerate fixture")
    assert(spark.sql(keylessSql).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "fixture no longer exercises the naive shape")
    for (w <- Seq(30L, 61L, 3600L)) {
      withBinWidth(w) { s =>
        fixtures(s)
        val df = s.sql(keylessSql)
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"width=$w: rule did not fire:\n${plan.take(800)}")
        assert(plan.contains("__graft_bin"), s"width=$w: no marker in plan")
        assert(pairs(df) == expected, s"width=$w: rewritten rows diverged")
      }
    }
  }

  test("keyed SQL inequality join: rewrite keeps the equi key and stays row-identical") {
    fixtures(spark)
    val expected = pairs(spark.sql(keyedSql))
    assert(expected.nonEmpty)
    withBinWidth(60L) { s =>
      fixtures(s)
      val df = s.sql(keyedSql)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
      assert(pairs(df) == expected)
    }
  }

  test("strict bounds survive the rewrite (residual keeps the original comparisons)") {
    import spark.implicits._
    val expected = {
      fixtures(spark)
      pairs(spark.sql("SELECT iid, pid FROM ivals JOIN pts ON pt > lo AND pt < hi"))
    }
    withBinWidth(60L) { s =>
      fixtures(s)
      val df = s.sql("SELECT iid, pid FROM ivals JOIN pts ON pt > lo AND pt < hi")
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(pairs(df) == expected)
    }
    // exact-boundary pin: a point AT lo/hi is excluded under strict bounds
    withBinWidth(60L) { s =>
      import s.implicits._
      Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
        .toDF("iid", "lo", "hi").createOrReplaceTempView("ivals")
      Seq((10L, ts("2024-01-01 10:00:00")), (11L, ts("2024-01-01 10:30:00")),
          (12L, ts("2024-01-01 11:00:00")))
        .toDF("pid", "pt").createOrReplaceTempView("pts")
      val strict = s.sql("SELECT iid, pid FROM ivals JOIN pts ON pt > lo AND pt < hi")
      assert(pairs(strict) == Set((1L, 11L)))
    }
  }

  test("rule is off by default and leaves outer joins untouched") {
    val s = spark.newSession() // no conf set
    fixtures(s)
    assert(s.sql(keylessSql).queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"), "unset conf must leave the plan alone")
    withBinWidth(60L) { s2 =>
      fixtures(s2)
      val outer = s2.sql(
        "SELECT iid, pid FROM ivals LEFT JOIN pts ON pt >= lo AND pt <= hi")
      assert(!outer.queryExecution.executedPlan.toString.contains("__graft_bin"),
        "outer join must not be rewritten")
    }
  }

  test("a malformed bin-width conf names the key instead of a raw NumberFormatException") {
    val s = spark.newSession()
    s.conf.set(RangeJoinRewrite.WidthConf, "30m")
    val ex = intercept[Exception] {
      s.sql("SELECT 1").collect() // the session-injected rule runs on EVERY plan
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains(RangeJoinRewrite.WidthConf) && m.contains("30m")),
      s"error must point at the conf key: $ex")
  }

  test("runaway intervals fail loudly under the rewrite's maxBins guard") {
    withBinWidth(1L) { s =>
      import s.implicits._
      s.conf.set(RangeJoinRewrite.MaxBinsConf, "1000")
      Seq((1L, ts("2024-01-01 00:00:00"), ts("2024-12-31 00:00:00")))
        .toDF("iid", "lo", "hi").createOrReplaceTempView("ivals")
      Seq((10L, ts("2024-06-01 00:00:00"))).toDF("pid", "pt")
        .createOrReplaceTempView("pts")
      val ex = intercept[Exception] { s.sql(keylessSql).count() }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("RangeJoinRewrite")), s"unexpected failure: $ex")
    }
  }
}
