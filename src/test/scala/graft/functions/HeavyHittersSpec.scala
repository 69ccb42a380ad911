package graft.functions

import scala.util.Random

import org.apache.spark.sql.Dataset

import graft.SparkSpec
import graft.functions.HeavyHitters.{MgSummary, MisraGries}

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def summarize(ds: Dataset[String], capacity: Int): Map[String, Long] =
    ds.select(new MisraGries(capacity).toColumn).head()
      .items.map(i => i.item -> i.est).toMap

  /** Zipf-ish skewed item stream: item i appears ~n/(i+1) times. */
  private def skewed(nDistinct: Int, scale: Int, seed: Int = 7): Seq[String] = {
    val items = (0 until nDistinct).flatMap(i => Seq.fill(scale / (i + 1))(s"tok$i"))
    new Random(seed).shuffle(items)
  }

  test("capacity >= distinct items makes the summary exact under any partitioning") {
    val data = skewed(20, 400)
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for (parts <- Seq(1, 5, 32)) {
      val got = summarize(data.toDS().repartition(parts), capacity = 32)
      assert(got == exact, s"parts=$parts")
    }
  }

  test("MG guarantees hold under every partitioning: undercount-only, bounded error, containment") {
    val data = skewed(200, 2000, seed = 13)
    val n = data.size.toLong
    val exact = data.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val capacity = 16
    val bound = n / (capacity + 1)
    for (parts <- Seq(1, 7, 32)) {
      val got = summarize(data.toDS().repartition(parts), capacity)
      assert(got.size <= capacity)
      got.foreach { case (k, est) =>
        val truth = exact(k)
        assert(est <= truth, s"parts=$parts: overcount for $k: $est > $truth")
        assert(truth - est <= bound, s"parts=$parts: error for $k beyond n/(c+1)")
      }
      exact.filter(_._2 > bound).keys.foreach { k =>
        assert(got.contains(k), s"parts=$parts: heavy item $k missing")
      }
    }
  }

  test("reduce-side decrement and merge-side cut both preserve the capacity bound") {
    // adversarial: distinct-heavy stream (every counter forever decrementing)
    val distinctHeavy = (0 until 3000).map(i => s"u$i") ++ Seq.fill(500)("hot")
    val got = summarize(distinctHeavy.toDS().repartition(8), capacity = 8)
    assert(got.size <= 8)
    // 'hot' has true count 500 > n/(c+1) = 3500/9 ≈ 388 — must survive
    assert(got.contains("hot"))
  }

  test("empty input yields an empty summary") {
    val got = spark.emptyDataset[String].select(new MisraGries(4).toColumn).head()
    assert(got == MgSummary(Seq.empty))
  }
}
