package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("validRows drops null, empty and whitespace-only required strings") {
    val df = Seq(
      (Some("acme"), Some(1L)),
      (Some(""), Some(2L)),
      (Some("   "), Some(3L)),
      (None: Option[String], Some(4L)),
      (Some("ok"), None: Option[Long]))
      .toDF("company", "id")
    val out = Cleaning.validRows(df, requiredString = Seq("company"), requiredAny = Seq("id"))
    assert(out.select("id").as[Long].collect().toSet == Set(1L))
  }

  test("validRows with no required columns is identity") {
    val df = Seq(("x", 1)).toDF("a", "b")
    assert(Cleaning.validRows(df, Nil).count() == 1)
  }

  test("dedupByKey keeps the deterministic winner per key") {
    val df = Seq(
      ("k1", 1, "old"), ("k1", 3, "new"), ("k1", 2, "mid"),
      ("k2", 5, "only"))
      .toDF("key", "version", "tag")
    val out = Cleaning.dedupByKey(df, Seq("key"), Seq(col("version").desc))
      .select("key", "tag").as[(String, String)].collect().toMap
    assert(out == Map("k1" -> "new", "k2" -> "only"))
  }

  test("dedupByKey is idempotent") {
    val df = Seq(("a", 1), ("a", 2), ("b", 1)).toDF("k", "v")
    val once = Cleaning.dedupByKey(df, Seq("k"), Seq(col("v")))
    val twice = Cleaning.dedupByKey(once, Seq("k"), Seq(col("v")))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("canonical upper-trims") {
    val out = Seq("  acme corp ").toDF("c").select(Cleaning.canonical(col("c"))).as[String].head()
    assert(out == "ACME CORP")
  }
}
