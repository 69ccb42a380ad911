package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time derivations (SURVEY §2.4). */
object Temporal {

  /** Epoch millis → date (D1, reference: bigdata-project/src/spark_job.py:51). */
  def epochMillisToDate(c: Column): Column = to_date(timestamp_millis(c.cast("long")))

  /** Epoch seconds (double) → timestamp (D2,
    * reference: bigdata-project/src/spark_streaming_v2.py:71-74).
    */
  def epochSecondsToTimestamp(c: Column): Column = to_timestamp(c.cast("double"))

  /** Day-of-week with Sunday = 0 .. Saturday = 6 — pinned convention shared
    * with the DuckDB oracle (Spark's `dayofweek` is 1-based Sunday=1;
    * DuckDB's is 0-based).
    */
  def dayOfWeekSun0(c: Column): Column = dayofweek(c) - 1

  /** Days elapsed between posting date and report date (D3,
    * reference: bigdata-project/src/spark_batch_v2.py:164-165).
    */
  def daysSince(newer: Column, older: Column): Column = datediff(newer, older)

  /** Freshness bucketing ladder (D7,
    * reference: bigdata-project/src/spark_batch_v2.py:168-173).
    */
  def freshness(days: Column): Column =
    when(days.isNull, "Unknown")
      .when(days < 1, "Fresh")
      .when(days <= 7, "Recent")
      .when(days <= 28, "Active")
      .otherwise("Old")
}
