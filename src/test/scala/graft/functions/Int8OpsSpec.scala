package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Int8OpsSpec extends SparkSpec {
  import spark.implicits._

  private def quantizeRef(v: Array[Float]): Array[Byte] = {
    val ma = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x.toDouble)))
    if (ma == 0.0) new Array[Byte](v.length)
    else v.map(x => math.floor(x.toDouble / ma * 127.0 + 0.5).toByte)
  }

  private def cosineRef(a: Array[Byte], b: Array[Byte]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toLong * y }.sum
    val na = a.map(x => x.toLong * x).sum
    val nb = b.map(x => x.toLong * x).sum
    dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  test("quantizeInt8: known values, max element hits exactly ±127, zero vector stays zero") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(-2.0f, 1.0f, 0.0f, 0.5f)),
      (3L, Seq(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"), Int8Ops.quantizeInt8Native(col("embedding")).as("q"))
      .as[(Long, Seq[Byte])].collect().toMap
    assert(out(1L).toSeq == Seq[Byte](127, -63, 32, 0))
    assert(out(2L).toSeq == Seq[Byte](-127, 64, 0, 32))
    assert(out(3L).toSeq == Seq[Byte](0, 0, 0, 0))
  }

  test("codegen path matches the Scala reference on random vectors (quantize + cosine)") {
    val rnd = new scala.util.Random(77)
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 4.0f))
    }
    val df = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"), Int8Ops.quantizeInt8Native(col("embedding")).as("q"))
      .as[(Long, Seq[Byte])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(got(id).toSeq == quantizeRef(v).toSeq, s"vec $id quantization diverged")
    }
    // pairwise int8 cosine through the engine == pure-Scala reference, bit-exact
    val pairs = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Int8Ops.cosineInt8Native(
          Int8Ops.quantizeInt8Native(col("a.embedding")),
          Int8Ops.quantizeInt8Native(col("b.embedding"))).as("sim"))
      .as[(Long, Long, Double)].collect()
    val byId = vecs.toMap
    pairs.foreach { case (a, b, sim) =>
      val exp = cosineRef(quantizeRef(byId(a)), quantizeRef(byId(b)))
      assert(sim == exp, s"pair ($a,$b): engine $sim != reference $exp")
    }
  }

  test("property: codegen quantize+cosine equals the Scala reference on arbitrary vectors") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // shape coverage over volume (Spark-per-case is slow): dims 1..8,
    // values spanning sign/zero/magnitude mixes incl. whole-zero vectors
    val vec: Gen[Array[Float]] = for {
      n <- Gen.choose(1, 8)
      xs <- Gen.listOfN(n, Gen.oneOf(
        Gen.const(0.0f), Gen.choose(-4.0f, 4.0f), Gen.choose(-0.01f, 0.01f)))
    } yield xs.toArray
    val prop = Prop.forAll(Gen.listOfN(3, vec)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
        .toDF("vec_id", "embedding")
      val got = df.select(col("vec_id"), Int8Ops.quantizeInt8Native(col("embedding")).as("q"))
        .as[(Long, Seq[Byte])].collect().toMap
      vecs.zipWithIndex.forall { case (v, i) =>
        got(i.toLong).toSeq == quantizeRef(v).toSeq
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("zero vector scores NaN against everything and ranks FIRST in a desc top-k window") {
    // Int8Cosine keeps CosineSimilarity's convention: a zero vector has no
    // direction, so 0/0 = NaN. Both Spark and DuckDB order NaN ABOVE every
    // other double, so a NaN score ranks identically (rank 1 in a desc
    // window) in both engines — pinned here in case a future corpus ever
    // carries an all-zero embedding into an oracled top-k.
    val df = Seq(
      (0L, Seq(1.0f, 0.5f)), (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.9f, 0.6f)))
      .toDF("vec_id", "embedding")
    val scored = df
      .select(col("vec_id"),
        Int8Ops.cosineInt8Native(
          Int8Ops.quantizeInt8Native(typedLit(Seq(1.0f, 0.4f))),
          Int8Ops.quantizeInt8Native(col("embedding"))).as("sim"))
    val nan = scored.filter(col("vec_id") === 1L).select("sim").as[Double].head()
    assert(nan.isNaN, s"zero vector scored $nan, expected NaN")
    val ranked = scored
      .select(col("vec_id"),
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("sim").desc, col("vec_id")))
          .as("rank"))
      .as[(Long, Int)].collect().toMap
    assert(ranked(1L) == 1, s"NaN must outrank every real score, got rank ${ranked(1L)}")
  }

  test("int8 cosine approximates float cosine within quantization error; ranking preserved on separated clusters") {
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 30).map { i =>
      (i.toLong, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2.0f))
    }
    val df = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val both = df.as("a").join(df.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("f"),
        Int8Ops.cosineInt8Native(
          Int8Ops.quantizeInt8Native(col("a.embedding")),
          Int8Ops.quantizeInt8Native(col("b.embedding"))).as("i8"))
      .as[(Double, Double)].collect()
    // 64-dim max-abs int8: per-element error <= 0.5/127 of the scale; the
    // cosine deviation stays comfortably inside 0.02 on random data
    both.foreach { case (f, i8) => assert(math.abs(f - i8) < 0.02, s"float $f vs int8 $i8") }
    // top-k agreement on the q63 shape: int8 ranking equals float ranking
    // when neighbors are well separated (here: exact-duplicate vectors)
    val clustered = (vecs.take(5) ++ vecs.take(5).map { case (id, v) => (id + 100, v) })
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val top = Similarity.int8TopK(clustered, clustered.filter(col("vec_id") < 5), 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    (0L until 5L).foreach(q => assert(top(q) == q + 100, s"query $q: got ${top(q)}"))
  }
}
