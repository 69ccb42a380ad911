package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** File-INTERNAL min/max row-group skipping — the other half of
  * "unpruned scan" at 100 TB (round-13 verdict #7). q65 proves
  * directory-level partition pruning; this battery proves that a lake
  * sorted on its query column at WRITE time lets the parquet reader skip
  * whole row groups via column statistics, and measures the effect
  * against the same data written unsorted (every row group spans the
  * full value range, so nothing can be skipped).
  *
  * The observable: FileSourceScanExec's `numOutputRows` counts rows
  * SURVIVING pushdown — i.e. rows in row groups the reader actually
  * decoded (residual row-level filtering happens in the Filter above the
  * scan). Sorted layout → a narrow predicate decodes a strict subset;
  * unsorted layout → the same predicate decodes everything.
  */
class RowGroupSkipSpec extends SparkSpec {

  private val total = 40000L

  /** numOutputRows of the single parquet scan after running `df`. */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected one parquet scan, got ${scans.size}")
    scans.head.metrics("numOutputRows").value
  }

  test("sort-on-write + narrow predicate decodes a strict subset of row groups; unsorted decodes all") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rgskip").toString
    val rows = spark.range(total).select(
      col("id"),
      (col("id") * 7919L % total).as("ts_key"), // decorrelated write order
      concat(lit("payload "), col("id")).as("body"))
    // ~40 KiB row groups => dozens of groups per file; ONE output file per
    // layout so the comparison is row-group-level, not file-level
    def write(df: DataFrame, path: String): Unit =
      df.coalesce(1).write
        .option("parquet.block.size", 40 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .mode("overwrite").parquet(path)
    write(rows.sortWithinPartitions("ts_key"), s"$dir/sorted")
    write(rows.sortWithinPartitions("id"), s"$dir/unsorted") // random in ts_key
    // narrow predicate: 5% of the ts_key domain
    val lo = 1000L
    val hi = 3000L
    def q(path: String) = spark.read.parquet(path)
      .filter(col("ts_key") >= lo && col("ts_key") < hi)
    val want = q(s"$dir/sorted").count()
    assert(want == q(s"$dir/unsorted").count() && want == hi - lo,
      s"selectivity sanity: $want")
    val sortedDecoded = scanRows(q(s"$dir/sorted"))
    val unsortedDecoded = scanRows(q(s"$dir/unsorted"))
    // the unsorted layout cannot skip: every row group spans the domain
    assert(unsortedDecoded == total,
      s"unsorted scan decoded $unsortedDecoded of $total")
    // the sorted layout skips: decoded rows are a strict subset — at
    // most a few row groups around the predicate range
    assert(sortedDecoded < total / 4,
      s"sorted scan decoded $sortedDecoded of $total — row groups not skipped " +
        "(did parquet.block.size stop applying, or did pushdown break?)")
    assert(sortedDecoded >= want, "decoded rows must cover the result")
    info(s"decoded rows: sorted=$sortedDecoded unsorted=$unsortedDecoded " +
      f"of $total (${100.0 * sortedDecoded / total}%.1f%% vs 100%%)")
  }

  test("the pushed filter actually reaches the scan (precondition of row-group skipping)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rgskip_pf").toString
    spark.range(1000).select(col("id"), (col("id") % 50).as("k"))
      .write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t").filter(col("k") === 7)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("k"), plan.take(500))
    assert(!plan.contains("PushedFilters: []"), plan.take(500))
  }
}
