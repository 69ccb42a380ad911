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
    * reference: bigdata-project/src/spark_batch_v2.py:168-173): the
    * reference's boundaries VERBATIM — `<= 1` Fresh, `<= 7` Recent,
    * `<= 30` Active, else Old. This is the ONE D7 ladder; JobPipeline
    * passes the reference's display labels (a second inline copy had
    * drifted to `< 1`/`<= 28` boundaries while citing the same reference
    * lines — review finding).
    *
    * `nullLabel`: the reference has no null branch (a null days falls to
    * the `otherwise` bucket); `Some("Unknown")` (the default) is the
    * engine's documented deviation for D7 analytics surfaces — pass
    * `None` for reference-verbatim null handling.
    */
  def freshness(
      days: Column,
      labels: Seq[String] = Seq("Fresh", "Recent", "Active", "Old"),
      nullLabel: Option[String] = Some("Unknown")): Column = {
    require(labels.length == 4, s"freshness needs 4 labels, got ${labels.length}")
    val ladder = when(days <= 1, labels(0))
      .when(days <= 7, labels(1))
      .when(days <= 30, labels(2))
      .otherwise(labels(3))
    nullLabel.fold(ladder)(u => when(days.isNull, u).otherwise(ladder))
  }
}
