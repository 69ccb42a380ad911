package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked windowed streaming aggregates (SURVEY §2.8 W1-W6).
  *
  * The same builders work on a batch DataFrame (window() is a plain grouping
  * expression) and on a streaming one (where the watermark bounds state and
  * drives update-mode emission) — exactly how batch-parity queries and the
  * MemoryStream tests share one code path.
  */
object StreamingAggs {

  /** Exact-integer-arithmetic mean: deterministic across partition order
    * and engines for money-like measures. See [[graft.functions.ExactAgg]].
    */
  private def avgExact2dp(c: org.apache.spark.sql.Column) =
    graft.functions.ExactAgg.avgExact2dp(c)

  /** The upsert doc_id for a (dims, window_start) group — the F8/W10
    * keyed-sink key, kept in the reference's readable `a_b_window` concat
    * format. NULL dims are rendered as an explicit "null" token: bare
    * `concat_ws` SKIPS nulls, so groups (null, "x") and ("x", null) would
    * collide on one key and the keyed-idempotent upsert would silently
    * overwrite one group's stats with the other's (review finding). A
    * literal `_` inside a dim value remains ambiguous with the separator —
    * that is the reference key format's own limitation; callers with
    * underscore-bearing dims should key on hashed dims instead.
    */
  private def upsertDocId(dims: Seq[String]): Column =
    concat_ws("_",
      dims.map(d => coalesce(col(d).cast("string"), lit("null"))) :+ col("window_start"): _*)

  /** Tumbling-window multi-agg (W4, reference:
    * bigdata-project/src/spark_streaming_v2.py:223-243): window × dims →
    * count, avg, conditional sum; window struct flattened (W5) and an upsert
    * doc_id synthesized (F8 / W10 keyed-idempotent sink contract).
    */
  def tumblingStats(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      dims: Seq[String],
      measure: String,
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    src
      .groupBy(window(col(tsCol), windowLen) +: dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"), avgExact2dp(col(measure)).as("avg_val"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start") +:
          dims.map(col) :+ col("cnt") :+ col("avg_val"): _*)
      .withColumn("doc_id", upsertDocId(dims))
  }

  /** Mergeable partial state of [[tumblingStats]] for ONE micro-batch:
    * (cnt, sum_cents, n_vals) per (window × dims). Partials from any number
    * of batches merge by plain summation ([[graft.sinks.Sinks.readMergedPartials]])
    * and finalize with [[finishStats]] — the exact average is a pure
    * function of (Σcents, Σn), which is what makes the state mergeable.
    * This is the log-structured streaming-aggregate path: each batch
    * appends O(batch) partials instead of stateful-store upserts rewriting
    * a table.
    */
  def tumblingPartials(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      dims: Seq[String],
      measure: String,
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    src
      .groupBy(window(col(tsCol), windowLen) +: dims.map(col): _*)
      .agg(
        count(lit(1)).as("cnt"),
        sum(graft.functions.ExactAgg.cents(col(measure))).as("sum_cents"),
        count(col(measure)).as("n_vals"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start") +:
          dims.map(col) :+ col("cnt") :+ col("sum_cents") :+ col("n_vals"): _*)
      .withColumn("doc_id", upsertDocId(dims))
  }

  /** Finalize merged [[tumblingPartials]] states into the
    * [[tumblingStats]] output columns (cnt, exact 4-decimal avg_val).
    */
  def finishStats(merged: DataFrame): DataFrame = {
    import graft.functions.ExactAgg
    merged.withColumn("avg_val",
      when(col("n_vals") > 0,
        ExactAgg.divHalfUp(col("sum_cents") * 100, col("n_vals")) / 10000.0))
      .drop("sum_cents", "n_vals")
  }

  /** Sliding-window count (W3, reference:
    * bigdata-project/src/spark_streaming.py:62-74).
    */
  def slidingCounts(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      slide: String,
      dims: Seq[String],
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(df)(w => df.withWatermark(tsCol, w))
    src
      .groupBy(window(col(tsCol), windowLen, slide) +: dims.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start") +:
          dims.map(col) :+ col("cnt"): _*)
  }
}
