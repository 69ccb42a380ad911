package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the bottom-k face of
  * the theta-sketch family (Bar-Yossef et al. 2002; Apache DataSketches'
  * theta), the distinct-count companion to [[HeavyHitters]]' frequency
  * summaries: at 100 TB an exact `COUNT(DISTINCT token)` per group is a
  * full shuffle of every distinct key, while a KMV summary ships at most
  * k hashes per partition through the partial-aggregate machinery and
  * merges associatively under any partitioning.
  *
  * Unlike Spark's built-in `approx_count_distinct` (HLL++, whose register
  * estimate no second engine reproduces), KMV over the engine's SHARED
  * 60-bit md5 hash ([[Dedup.tokenHash64]] — the MinHash primitive every
  * DuckDB oracle already re-derives) is a pure integer function of the
  * value set: the k smallest distinct hashes, and the classic estimator
  * (k−1)·2⁶⁰/h₍ₖ₎ in two-step int64 floor division. The q130 oracle
  * therefore re-computes the ENTIRE report bit-identically from the base
  * table — a full value gate on a sketch, not an error envelope.
  *
  * Determinism: the k-minima SET is a pure function of the input value
  * set (no partition dependence — min is commutative), so unlike the MG
  * summary this sketch is value-stable across any execution plan.
  *
  * Estimator contract, pinned by `KmvSpec` and the q130 oracle:
  *   - fewer than k distinct hashes seen → `estimate` = that exact count
  *     (the sketch holds the whole hash set);
  *   - saturated → `estimate` = (k−1) · floorDiv(2⁶⁰, h₍ₖ₎): the
  *     two-step quantization keeps everything in int64 for BOTH engines
  *     (one-step (k−1)·2⁶⁰ overflows) at ≤ k/n relative rounding — far
  *     inside the sketch's own ~1/√(k−2) standard error;
  *   - 60-bit md5 collisions undercount distincts exactly as they do in
  *     the minhash family (≈ n²/2⁶¹ expected — negligible below billions
  *     of distincts per group, and identically in both engines).
  */
object Kmv {

  /** Summary buffer: the strictly-increasing k smallest distinct hashes. */
  final case class KmvBuf(mins: Seq[Long])

  /** (number of retained minima, k-th minimum or 0 if unsaturated, the
    * distinct estimate).
    */
  final case class KmvSummary(n_min: Long, kth: Long, estimate: Long)

  /** The estimator over a retained min-set — shared by the aggregator's
    * finish and artifact readers ([[graft.pipeline.IngestPipeline]]'s
    * feed monitor), so a persisted sketch and a live one can never
    * disagree on the arithmetic.
    */
  def summarize(mins: Seq[Long], k: Int): KmvSummary = {
    val n = mins.length.toLong
    if (n < k) KmvSummary(n, 0L, n)
    else {
      val kth = math.max(mins.last, 1L)
      KmvSummary(n, mins.last, (k - 1).toLong * Math.floorDiv(1L << 60, kth))
    }
  }

  /** Driver-side merge of sorted distinct min-sets (both ≤ k), the same
    * union-and-trim the aggregator's merge performs.
    */
  def mergeMins(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  /** The typed aggregator over pre-hashed values:
    * `df.groupBy(g).agg(new Kmv.Sketch(k).toColumn)` on a
    * [[Dedup.tokenHash64]] column.
    */
  /** One hash into a sorted distinct min-set, trimmed to k. */
  private def insert(b: KmvBuf, h: Long, k: Int): KmvBuf = {
    val m = b.mins
    if (m.length == k && h >= m.last) b
    else {
      val i = insertionPoint(m, h)
      if (i < 0) b // already present
      else {
        val grown = (m.take(i) :+ h) ++ m.drop(i)
        KmvBuf(if (grown.length > k) grown.take(k) else grown)
      }
    }
  }

  /** Index where `h` belongs in the sorted seq; −1 if already there. */
  private def insertionPoint(m: Seq[Long], h: Long): Int = {
    var lo = 0
    var hi = m.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val v = m(mid)
      if (v == h) return -1
      else if (v < h) lo = mid + 1
      else hi = mid
    }
    lo
  }

  sealed abstract class KmvAggregator[OUT: Encoder](k: Int)
      extends Aggregator[Long, KmvBuf, OUT] {
    require(k >= 2, s"k must be >= 2, got $k")
    override def zero: KmvBuf = KmvBuf(Vector.empty)
    override def reduce(b: KmvBuf, h: Long): KmvBuf = insert(b, h, k)
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
      if (a.mins.isEmpty) b
      else if (b.mins.isEmpty) a
      else b.mins.foldLeft(a)((acc, h) => insert(acc, h, k))
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[OUT] = implicitly[Encoder[OUT]]
  }

  class Sketch(k: Int)
      extends KmvAggregator[KmvSummary](k)(Encoders.product[KmvSummary]) {
    override def finish(b: KmvBuf): KmvSummary = summarize(b.mins, k)
  }

  /** The min-SET face of the aggregator — for folds that persist the
    * retained minima themselves (the ingest feed monitor): same reduce/
    * merge, finish returns the buffer.
    */
  class MinSet(k: Int)
      extends KmvAggregator[KmvBuf](k)(Encoders.product[KmvBuf]) {
    override def finish(b: KmvBuf): KmvBuf = b
  }

  /** Per-group distinct-cardinality monitor over `valueCol`: the sketch
    * estimate next to the exact distinct and the relative error in e6 —
    * the audit face a curator runs at gate scale to certify the sketch
    * before trusting it alone at corpus scale (where only the sketch
    * aggregation runs: drop the exact column and the plan is one bounded
    * partial-aggregate pass, no distinct shuffle).
    *
    * Output: (groupCol, n_rows, distinct_exact, sketch_n_min, sketch_kth,
    * distinct_est, rel_err_e6).
    */
  def distinctReport(
      df: DataFrame, groupCol: String, valueCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketch = df
      .select(col(groupCol).as("g"), Dedup.tokenHash64(col(valueCol)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new Sketch(k).toColumn.name("s"))
      .select(col("key").as("g"),
        col("s.n_min").as("sketch_n_min"),
        col("s.kth").as("sketch_kth"),
        col("s.estimate").as("distinct_est"))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col(valueCol)).as("distinct_exact"))
      .join(sketch, col(groupCol) === col("g"))
      .select(col(groupCol), col("n_rows"), col("distinct_exact"),
        col("sketch_n_min"), col("sketch_kth"), col("distinct_est"),
        ExactAgg.divHalfUp(
          abs(col("distinct_est") - col("distinct_exact")) * 1000000L,
          greatest(col("distinct_exact"), lit(1L))).as("rel_err_e6"))
  }
}
