package graft.functions

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {

  import spark.implicits._

  private val Dims = 64
  private val M = 8
  private val K = 16

  /** Clustered fixture: `nClusters` seeded centers, members = center +
    * small noise — the structure PQ is supposed to exploit.
    */
  private def clustered(n: Int, nClusters: Int = 5, seed: Int = 7): DataFrame = {
    val rnd = new Random(seed)
    val centers = Array.fill(nClusters, Dims)((rnd.nextDouble() - 0.5).toFloat)
    (0L until n.toLong).map { i =>
      val c = centers((i % nClusters).toInt)
      (i, c.map(x => x + (rnd.nextDouble() * 0.06 - 0.03).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  /** Naive reference encoder (independent of the expression under test). */
  private def refEncode(v: Array[Float], model: Pq.PqModel): Array[Byte] = {
    (0 until model.m).map { mi =>
      (0 until model.k).minBy { ki =>
        (0 until model.subDim).map { d =>
          val src = mi * model.subDim + d
          val xv = if (src < v.length) v(src).toDouble else 0.0
          val diff = xv - model.codebooks(((mi * model.k) + ki) * model.subDim + d).toDouble
          diff * diff
        }.sum
      }.toByte
    }.toArray
  }

  private def reconstruct(codes: Array[Byte], model: Pq.PqModel): Array[Double] =
    (0 until model.dims).map { dim =>
      val mi = dim / model.subDim
      val d = dim - mi * model.subDim
      model.codebooks(((mi * model.k) + codes(mi)) * model.subDim + d).toDouble
    }.toArray

  test("encode matches the naive reference and is identical across partitionings") {
    val df = clustered(120)
    val model = Pq.train(df, Pq.initCodebooks(df, Dims, M, K), iters = 2)
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val expected = rows.map { case (id, v) => id -> refEncode(v, model).toSeq }.toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts)
        .select(col("vec_id"), Pq.encodeNative(col("embedding"), model).as("codes"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("training is bit-identical under any partitioning (fixed-point accumulation)") {
    val df = clustered(150)
    val init = Pq.initCodebooks(df, Dims, M, K)
    val models = Seq(1, 5, 32).map(p => Pq.train(df.repartition(p), init, iters = 3))
    models.tail.foreach { m2 =>
      assert(java.util.Arrays.equals(models.head.codebooks, m2.codebooks))
    }
  }

  test("Lloyd's improves distortion on clustered data and never regresses") {
    val df = clustered(200)
    val init = Pq.initCodebooks(df, Dims, M, K)
    val d0 = Pq.distortion(df, init)
    var prev = d0
    var cur = init
    for (i <- 1 to 3) {
      cur = Pq.train(df, cur, iters = 1)
      val d = Pq.distortion(df, cur)
      // exact Lloyd's is monotone; the 1e-8 fixed-point rounding of the
      // update can perturb a step by O(eps) — allow that and nothing more
      assert(d <= prev + 1e-9, s"iter $i: $prev -> $d")
      prev = d
    }
    assert(prev < d0 * 0.9, s"training should visibly improve clustered data: $d0 -> $prev")
  }

  test("ADC score equals cosine(query, reconstruction) computed naively") {
    val df = clustered(80, seed = 11)
    val model = Pq.train(df, Pq.initCodebooks(df, Dims, M, K), iters = 2)
    val queries = df.filter(col("vec_id") < 3)
    // pure-ADC top-k exposes the raw scores (refine off)
    val got = Pq.pqTopK(df, queries, model, k = 77, refine = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vecs = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    got.foreach { case ((qid, nid), sim) =>
      val q = vecs(qid)
      val rec = reconstruct(refEncode(vecs(nid), model), model)
      val dot = q.map(_.toDouble).zip(rec).map { case (a, b) => a * b }.sum
      val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
      val rn = math.sqrt(rec.map(x => x * x).sum)
      val expected = math.rint(dot / (qn * rn) * 10000) / 10000
      assert(math.abs(sim - expected) < 1e-9, s"($qid,$nid): $sim vs $expected")
    }
  }

  test("pqTopK contract: k rows per query ranked 1..k, no self-match; refine recalls the clusters") {
    val df = clustered(300, seed = 3)
    val model = Pq.train(df, Pq.initCodebooks(df, Dims, M, K), iters = 3)
    val queries = df.filter(col("vec_id") < 8)
    val k = 10
    val res = Pq.pqTopK(df, queries, model, k = k, refine = 5 * k).collect()
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.size == 8)
    byQ.foreach { case (qid, rows) =>
      assert(rows.length == k)
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to k))
      assert(!rows.exists(_.getLong(1) == qid), s"self-match for $qid")
    }
    // recall vs exact brute force — clusters are tight, PQ must find them
    val exact = Similarity.bruteForceTopK(df, queries, k)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = res.count(r => exact((r.getLong(0), r.getLong(1))))
    assert(hits >= (exact.size * 0.8).toInt, s"recall too low: $hits / ${exact.size}")
  }

  test("null embedding propagates null codes; short vectors encode as zero-padded") {
    val df = clustered(40, seed = 19)
    val model = Pq.train(df, Pq.initCodebooks(df, Dims, M, K), iters = 1)
    val withNull = Seq((900L, null: Seq[Float])).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val r = withNull.select(Pq.encodeNative(col("embedding"), model)).head()
    assert(r.isNullAt(0))
    // a 40-dim prefix must encode exactly like its 64-dim zero-padded form
    val short = Array.fill(40)(0.1f)
    val padded = short ++ Array.fill(Dims - 40)(0.0f)
    val both = Seq((1L, short.toSeq), (2L, padded.toSeq)).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .select(col("vec_id"), Pq.encodeNative(col("embedding"), model).as("codes"))
      .collect().map(r2 => r2.getLong(0) -> r2.getSeq[Byte](1)).toMap
    assert(both(1L) == both(2L))
  }

  test("training with k > 128 codes survives the byte's sign (no negative codebook indexing)") {
    // codes ≥ 128 store as negative bytes; the trainer must mask them back
    // (review finding: an unmasked cast crashed the update or silently
    // overwrote a DIFFERENT subspace's entry)
    val df = clustered(260, nClusters = 40, seed = 31)
    val init = Pq.initCodebooks(df, Dims, m = 2, k = 200)
    val trained = Pq.train(df, init, iters = 2)
    assert(trained.codebooks.length == init.codebooks.length)
    // the trained model must still be a strict improvement on clustered data
    assert(Pq.distortion(df, trained) <= Pq.distortion(df, init) + 1e-9)
    // and high codes actually occur (the fixture exercises the masked path)
    val codes = df.select(Pq.encodeNative(col("embedding"), trained))
      .collect().flatMap(_.getSeq[Byte](0))
    assert(codes.exists(_ < 0), "fixture never produced a code >= 128 — weaken nothing")
  }

  test("short vectors encode zero-padded but do not move codebook entries in training") {
    val full = clustered(100, seed = 37)
    val short = Seq((900L, Array.fill(24)(0.5f).toSeq), (901L, Array.fill(8)(-0.3f).toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    val init = Pq.initCodebooks(full, Dims, M, K)
    val a = Pq.train(full, init, iters = 2)
    val b = Pq.train(full.unionByName(short), init, iters = 2)
    // the update averages full-dimension members only (assignment counts a
    // short vector's zero-padding, the mean would not — excluding it keeps
    // the update the Lloyd's minimizer; review finding)
    assert(java.util.Arrays.equals(a.codebooks, b.codebooks))
  }

  test("distortion on an empty corpus fails with a clear message, not an NPE") {
    val df = clustered(40, seed = 41)
    val model = Pq.initCodebooks(df, Dims, M, K)
    val ex = intercept[IllegalArgumentException] {
      Pq.distortion(df.filter(col("vec_id") < 0), model)
    }
    assert(ex.getMessage.contains("empty"), ex.getMessage)
  }

  test("distortionPair equals the two single-model distortions (one pass, same values)") {
    val df = clustered(120, nClusters = 6, seed = 43)
    val init = Pq.initCodebooks(df, Dims, M, K)
    val trained = Pq.train(df, init, iters = 1)
    val (dt, di) = Pq.distortionPair(df, trained, init)
    assert(dt == Pq.distortion(df, trained), "trained distortion drifted in the fused pass")
    assert(di == Pq.distortion(df, init), "init distortion drifted in the fused pass")
    val ex = intercept[IllegalArgumentException] {
      Pq.distortionPair(df.filter(col("vec_id") < 0), trained, init)
    }
    assert(ex.getMessage.contains("empty"), ex.getMessage)
  }

  test("interpreted eval agrees with codegen (the driver-side eval path)") {
    val df = clustered(30, seed = 23)
    val model = Pq.train(df, Pq.initCodebooks(df, Dims, M, K), iters = 1)
    val vecs = df.collect().map(_.getSeq[Float](1).toArray)
    // nullSafeEval path: evaluate the expression directly against a row
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeArrayData}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val enc = PqEncode(BoundReference(0, ArrayType(FloatType), nullable = true), model)
    vecs.take(5).foreach { v =>
      val row = InternalRow(UnsafeArrayData.fromPrimitiveArray(v))
      val got = enc.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      assert(got.toByteArray().toSeq == refEncode(v, model).toSeq)
    }
  }
}
