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
    *
    * The sample stddev comes from exact integer moments over cents —
    * √((n·Σc² − (Σc)²) / (n(n−1))) — with decimal(38,0) intermediates
    * (mirrored by DuckDB's HUGEINT sums): the radicand is the SAME integer
    * in both engines, so the resulting double is bit-identical, unlike
    * float Welford accumulation which is partition-order dependent. The
    * final value is floored (not rounded) at 1e-4: floor of an identical
    * double is unambiguous, while Spark and DuckDB disagree on round()
    * ties. Exact while n·Σc⁴ᵉⁿᵗˢ² < 10^38 — ~10^25 rows at cents ≤ 10^6.
    */
  def dimensionStats(df: DataFrame, dims: Seq[String], measure: String, flagCond: Column): DataFrame = {
    val c = graft.functions.ExactAgg.cents(col(measure))
    val n = count(col(measure))
    val s1 = sum(c)
    // c² multiplied in DECIMAL: the long×long form overflowed Long.MaxValue
    // for any single measure ≥ ~$30.4M in cents (ARITHMETIC_OVERFLOW under
    // ANSI), inside the very aggregate whose doc promises decimal(38,0)
    // exactness (review finding). decimal(19,0)² is exact to 10^38 and the
    // (28,0) cast keeps the downstream sum types — and the oracle SQL —
    // unchanged.
    val s2 = sum((c.cast("decimal(19,0)") * c.cast("decimal(19,0)")).cast("decimal(28,0)"))
    val varNum = n.cast("decimal(38,0)") * s2 - s1.cast("decimal(19,0)") * s1.cast("decimal(19,0)")
    val stddev = when(n > 1,
      floor(sqrt(varNum.cast("double") / (n * (n - 1)).cast("double")) * 100.0) / 10000.0)
    df.groupBy(dims.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        avgExact2dp(col(measure)).as("avg_val"),
        min(col(measure)).as("min_val"),
        max(col(measure)).as("max_val"),
        stddev.as("stddev_val"),
        sum(when(flagCond, 1).otherwise(0)).as("flag_cnt"))
  }

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
