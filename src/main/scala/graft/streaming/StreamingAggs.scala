package graft.streaming

import org.apache.spark.sql.DataFrame
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
      .withColumn("doc_id", concat_ws("_", dims.map(col) :+ col("window_start"): _*))
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
