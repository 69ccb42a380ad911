package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state streaming operators (`KeyValueGroupedDataset`
  * + `flatMapGroupsWithState`) — the custom-state layer the reference never
  * needed (SURVEY §2.8 notes its absence) but a complete engine must offer.
  *
  * State is per-key and partition-local: Spark shuffles by key once and the
  * state store scales horizontally with executors; timeouts bound state
  * size — the properties that keep this viable on an unbounded 100 TB/day
  * stream.
  */
object StatefulOps {

  final case class KeyCount(key: String, total: Long)

  /** Running per-key count: each micro-batch emits the updated cumulative
    * total for every key seen in it.
    *
    * @param timeout optional processing-time state eviction (e.g. "1 hour").
    *                None keeps state forever — note that a configured
    *                timeout makes the engine schedule continuous no-data
    *                micro-batches to check deadlines, so only enable it on
    *                real deployments, not tight test loops.
    */
  def runningCounts(
      ds: Dataset[(String, Long)],
      timeout: Option[String] = None): Dataset[KeyCount] = {
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val outEnc: Encoder[KeyCount] = Encoders.product[KeyCount]
    val timeoutConf = timeout.fold(GroupStateTimeout.NoTimeout())(_ =>
      GroupStateTimeout.ProcessingTimeTimeout())
    ds.groupByKey(_._1)(Encoders.STRING)
      .flatMapGroupsWithState[Long, KeyCount](OutputMode.Update(), timeoutConf) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(0L)
            val add = rows.map(_._2).sum
            val next = prev + add
            state.update(next)
            timeout.foreach(state.setTimeoutDuration)
            Iterator.single(KeyCount(key, next))
          }
      }
  }
}
