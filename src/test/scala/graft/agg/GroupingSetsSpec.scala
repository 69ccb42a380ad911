package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multi-dimensional aggregation lattice (q33 cube, q114 grouping sets):
  * pins the algebra between the three flavors so the q114 SQL's set list
  * provably carries the rollup chain the verdict asked for.
  */
class GroupingSetsSpec extends SparkSpec {
  import spark.implicits._

  private def sales = Seq(
    ("a", "x", "M", 10L), ("a", "y", "T", 20L), ("b", "x", "M", 30L),
    ("b", "x", "T", 40L), ("a", "x", "T", 50L)).toDF("f", "s", "m", "q")

  test("DataFrame rollup equals the GROUPING SETS chain ((f,s),(f),())") {
    sales.createOrReplaceTempView("gs_sales")
    val viaRollup = sales.rollup("f", "s")
      .agg(count(lit(1)).as("cnt"), sum(col("q")).as("sq"))
      .select(
        coalesce(col("f"), lit("ALL")).as("f"),
        coalesce(col("s"), lit("ALL")).as("s"),
        col("cnt"), col("sq"))
      .orderBy("f", "s").collect().toSeq
    val viaSets = spark.sql(
      """SELECT COALESCE(f, 'ALL') AS f, COALESCE(s, 'ALL') AS s,
        |  COUNT(*) AS cnt, SUM(q) AS sq
        |FROM gs_sales GROUP BY GROUPING SETS ((f, s), (f), ())
        |ORDER BY f, s""".stripMargin).collect().toSeq
    assert(viaRollup == viaSets)
  }

  test("the q114 mixed lattice = rollup rows + the independent (m) slice, flagged by grouping()") {
    sales.createOrReplaceTempView("gs_sales")
    val out = spark.sql(
      """SELECT COALESCE(f, 'ALL') AS f, COALESCE(s, 'ALL') AS s,
        |  COALESCE(m, 'ALL') AS m,
        |  CAST(grouping(m) AS BIGINT) AS gm, COUNT(*) AS cnt
        |FROM gs_sales
        |GROUP BY GROUPING SETS ((f, s), (f), (m), ())
        |ORDER BY gm, f, s, m""".stripMargin).collect()
    // the (m) set: gm = 0 and both dims rolled up
    val mSlice = out.filter(_.getLong(3) == 0L)
    assert(mSlice.map(_.getString(2)).toSeq == Seq("M", "T"))
    assert(mSlice.forall(r => r.getString(0) == "ALL" && r.getString(1) == "ALL"))
    // the rollup chain: (f,s) leaves + (f) subtotals + the grand total
    val chain = out.filter(_.getLong(3) == 1L)
    assert(chain.count(r => r.getString(1) != "ALL") == 3)          // (f,s) leaves
    assert(chain.count(r => r.getString(0) != "ALL" && r.getString(1) == "ALL") == 2)
    assert(chain.count(r => r.getString(0) == "ALL" && r.getString(1) == "ALL") == 1)
    // grand total counts every row exactly once
    assert(out.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL" &&
      r.getString(2) == "ALL").map(_.getLong(4)).toSeq == Seq(5L))
  }
}
