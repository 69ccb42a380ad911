package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's grouped batch aggregates (SURVEY §2.6) as reusable
  * builders. All are hash aggregates over low-cardinality dimensions —
  * Catalyst plans them as two-phase partial/final HashAggregate, so the
  * shuffle carries only (dims × partial states), never the fact rows.
  */
object BatchAggregates {

  /** 4-decimal mean in exact integer arithmetic — deterministic across
    * partition order and bit-replicable in any engine, unlike round(avg(x),4)
    * which flips on exact 4th-decimal ties. See [[graft.functions.ExactAgg]].
    */
  private def avgExact2dp(c: org.apache.spark.sql.Column) =
    graft.functions.ExactAgg.avgExact2dp(c)

  /** Company-stats shape (A2, reference:
    * bigdata-project/src/spark_batch_v2.py:261-270): count / avg / min / max /
    * stddev over the measure plus a conditional sum.
    */
  def dimensionStats(df: DataFrame, dims: Seq[String], measure: String, flagCond: Column): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        avgExact2dp(col(measure)).as("avg_val"),
        min(col(measure)).as("min_val"),
        max(col(measure)).as("max_val"),
        round(stddev_samp(col(measure)), 4).as("stddev_val"),
        sum(when(flagCond, 1).otherwise(0)).as("flag_cnt"))

  /** Percentile stats (A4, reference:
    * bigdata-project/src/spark_batch_v2.py:292-298). Uses EXACT `percentile`
    * so the DuckDB oracle (`quantile_cont`) matches bit-for-bit at any scale
    * factor; swap to `percentile_approx` where sketch mergeability matters
    * more than exactness.
    */
  def percentileStats(df: DataFrame, dims: Seq[String], measure: String): DataFrame =
    df.groupBy(dims.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        avgExact2dp(col(measure)).as("avg_val"),
        round(percentile(col(measure), lit(0.25)), 4).as("p25"),
        round(percentile(col(measure), lit(0.5)), 4).as("p50"),
        round(percentile(col(measure), lit(0.75)), 4).as("p75"))

  /** Temporal stats (A6): counts/avg by calendar dims. */
  def temporalStats(df: DataFrame, dowCol: String, monthCol: String, measure: String): DataFrame =
    df.groupBy(col(dowCol), col(monthCol))
      .agg(count(lit(1)).as("cnt"), avgExact2dp(col(measure)).as("avg_val"))

  /** Cross-tab distribution (A7): counts by two categorical dims. */
  def distribution(df: DataFrame, dimA: String, dimB: String): DataFrame =
    df.groupBy(col(dimA), col(dimB)).agg(count(lit(1)).as("cnt"))
}
