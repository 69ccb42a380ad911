package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming joins — absent from the reference (SURVEY §2.8 notes it) but
  * required engine surface for a complete streaming story.
  */
object StreamJoins {

  /** Stream-static enrichment: broadcast the dimension under every
    * micro-batch; no state, no stream shuffle. The standard pattern for
    * attaching slowly-changing reference data to a live stream.
    */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame, key: Seq[String]): DataFrame =
    stream.join(broadcast(dim), key, "left")

  /** Stream-stream inner join on a key within an event-time band. Both
    * sides are watermarked and the time-range predicate lets Spark bound
    * join state: rows older than (watermark − band) are evicted instead of
    * accumulating forever — the property that keeps stream-stream joins
    * viable on unbounded input.
    */
  def joinWithinBand(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      band: String,
      watermark: String): DataFrame =
    left.withWatermark(leftTs, watermark).join(
      right.withWatermark(rightTs, watermark),
      expr(
        s"""$leftKey = $rightKey AND
           |$rightTs >= $leftTs AND
           |$rightTs <= $leftTs + INTERVAL $band""".stripMargin))
}
