package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy hitters — frequent-item summaries without a full
  * groupBy, the vocabulary-scale companion to the HLL / approx-percentile
  * sketches (q39/q60): at 100 TB a token-frequency table is itself a
  * giant shuffle (every token key moves), while an MG summary of capacity
  * c ships at most c counters per partition through the partial-aggregate
  * machinery — the map side does the compression, exactly like
  * `approx_count_distinct`'s HLL buffers.
  *
  * Guarantees (Misra & Gries 1982; merge rule per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012 — subtract the (c+1)-th largest
  * counter on overflow): with n total items,
  *   - UNDERCOUNT ONLY: every estimate ≤ the item's true count;
  *   - BOUNDED error: true − estimate ≤ n/(c+1), under ANY merge order
  *     and partitioning;
  *   - CONTAINMENT: every item with true count > n/(c+1) is present.
  * The summary SET is not deterministic across partitionings (ties break
  * by merge order) — the q94 gate therefore asserts the mathematical
  * guarantees (deterministically true for any correct execution) against
  * an exact baseline, never the summary rows themselves: the q62/q64
  * envelope discipline applied to a sketch whose output is legitimately
  * partition-dependent.
  */
object HeavyHitters {

  /** Summary buffer: at most `capacity` counters. Immutable map — the
    * per-row churn is bounded by the capacity (small by construction),
    * and the product encoder keeps the buffer off kryo.
    */
  final case class MgBuf(counts: Map[String, Long])

  final case class MgItem(item: String, est: Long)

  /** Summary result, descending estimate then item (a rendering order
    * only — see the determinism note on the object).
    */
  final case class MgSummary(items: Seq[MgItem])

  /** The typed aggregator: `ds.select(new MisraGries(64).toColumn)`. */
  class MisraGries(capacity: Int) extends Aggregator[String, MgBuf, MgSummary] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    override def zero: MgBuf = MgBuf(Map.empty)

    override def reduce(b: MgBuf, item: String): MgBuf = {
      val c = b.counts
      c.get(item) match {
        case Some(v) => MgBuf(c.updated(item, v + 1L))
        case None if c.size < capacity => MgBuf(c.updated(item, 1L))
        // decrement-all: the classic MG step — every counter pays 1 for
        // the unadmitted item, zeros drop
        case None => MgBuf(c.flatMap { case (k, v) =>
          if (v > 1L) Some(k -> (v - 1L)) else None })
      }
    }

    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      if (a.counts.isEmpty) return b
      if (b.counts.isEmpty) return a
      val sum = (a.counts.keySet ++ b.counts.keySet).iterator
        .map(k => k -> (a.counts.getOrElse(k, 0L) + b.counts.getOrElse(k, 0L)))
        .toMap
      if (sum.size <= capacity) MgBuf(sum)
      else {
        // mergeable-summaries rule: subtract the (capacity+1)-th largest
        // count from everything; ≤ capacity strictly-positive counters
        // survive and the total undercount stays within n/(capacity+1)
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(capacity)
        MgBuf(sum.flatMap { case (k, v) => if (v > cut) Some(k -> (v - cut)) else None })
      }
    }

    override def finish(b: MgBuf): MgSummary =
      MgSummary(b.counts.toSeq.map { case (k, v) => MgItem(k, v) }
        .sortBy(i => (-i.est, i.item)))

    override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
    override def outputEncoder: Encoder[MgSummary] = Encoders.product[MgSummary]
  }
}
