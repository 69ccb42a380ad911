package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression is bit-identical to the HOF composition") {
    val rnd = Gen.listOfN(64, Gen.choose(-1f, 1f))
    val vecs = (1 to 50).map(_ => (rnd.sample.get, rnd.sample.get))
    val df = vecs.toDF("a", "b")
    val out = df.select(
      Similarity.cosine(col("a"), col("b")).as("hof"),
      CosineSimilarity.cosineNative(col("a"), col("b")).as("native"))
      .as[(Double, Double)].collect()
    out.foreach { case (h, n) => assert(h == n, s"bit mismatch: $h vs $n") }
  }

  test("native expression known values + null propagation") {
    val out = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(2f, 4f))),
      (None: Option[Seq[Float]], Some(Seq(1f, 0f))))
      .toDF("a", "b")
      .select(round(CosineSimilarity.cosineNative(col("a"), col("b")), 10))
      .as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(1.0), None))
  }

  test("codegen path actually compiles (no interpreted fallback crash on wide batch)") {
    val vecs = (1 to 1000).map(i => (Seq.fill(64)(i.toFloat / 1000f), Seq.fill(64)(0.5f)))
    val n = vecs.toDF("a", "b")
      .select(CosineSimilarity.cosineNative(col("a"), col("b")).as("s"))
      .filter(col("s") > 0.9).count()
    assert(n == 1000L) // parallel-ish vectors -> cosine 1.0
  }

  test("GraftExtensions registers cosine_sim for SQL users") {
    // spark.sql.extensions is a STATIC conf — TestSpark sets it when the
    // suite's context is first built, so the shared session resolves the
    // injected function by name in plain SQL.
    val r = spark.sql(
      "SELECT round(cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 10) AS s")
      .collect().head.getDouble(0)
    assert(r == 1.0)
  }

  test("GraftExtensions registers dot_product for SQL users") {
    val r = spark.sql(
      "SELECT dot_product(array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)), array(0.5D, 2.0D)) AS s")
      .collect().head.getDouble(0)
    assert(r == 7.0)
  }

  test("GraftExtensions registers quantize_int8 + cosine_int8 for SQL users") {
    // quantize [1, -0.5] -> [127, -63]; self-cosine of a quantized vector
    // is 1 up to the sqrt(x)*sqrt(x) ulp
    val r = spark.sql(
      """SELECT cosine_int8(
        |  quantize_int8(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))),
        |  quantize_int8(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT)))) AS s""".stripMargin)
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12, r.toString)
  }

  test("GraftExtensions registers the round-10 dedup natives for SQL users") {
    // minhash_sig defaults (64, 42) must match the Column API so SQL and
    // DataFrame callers compute the same signature
    val viaSql = spark.sql(
      "SELECT minhash_sig(array('a','b','c')) AS s, " +
        "simhash_fp(array('a','b','c')) AS f").collect().head
    import spark.implicits._
    val viaApi = Seq(Seq("a", "b", "c")).toDF("t")
      .select(
        MinHash.signatureNative(org.apache.spark.sql.functions.col("t"), 64, 42L).as("s"),
        SimHash.fingerprintNative(org.apache.spark.sql.functions.col("t"), 60).as("f"))
      .collect().head
    assert(viaSql.getSeq[Long](0) == viaApi.getSeq[Long](0))
    assert(viaSql.getLong(1) == viaApi.getLong(1))
    // explicit params + sig_agree: two 8-hash signatures of overlapping
    // token sets agree on some but not all positions; self-agreement is 8
    val r = spark.sql(
      """SELECT
        |  sig_agree(minhash_sig(array('a','b'), 8, 7), minhash_sig(array('a','b'), 8, 7)) AS self,
        |  sig_agree(minhash_sig(array('a','b'), 8, 7), minhash_sig(array('c','d'), 8, 7)) AS other
        |""".stripMargin).collect().head
    assert(r.getInt(0) == 8)
    assert(r.getInt(1) < 8)
    // non-literal parameter is rejected with a clear message, not computed
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), id) FROM range(1)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"), err.getMessage)

    // a Long-range seed must flow through untruncated: the SQL literal
    // 5000000000 and the Column API's 5000000000L must produce the SAME
    // signature (the old Int round-trip silently computed under seed
    // 705032704)
    val bigSeedSql = spark.sql(
      "SELECT minhash_sig(array('a','b'), 8, 5000000000) AS s").collect().head
      .getSeq[Long](0)
    val bigSeedApi = Seq(Tuple1(Seq("a", "b"))).toDF("toks")
      .select(MinHash.signatureNative(col("toks"), 8, 5000000000L).as("s"))
      .collect().head.getSeq[Long](0)
    assert(bigSeedSql == bigSeedApi, s"SQL $bigSeedSql != API $bigSeedApi")

    // missing arguments fail with the function's name and arity, not an
    // IndexOutOfBoundsException from children(1)
    val arity = intercept[Exception] {
      spark.sql("SELECT sig_agree(minhash_sig(array('a')))").collect()
    }
    assert(arity.getMessage.contains("sig_agree") &&
      arity.getMessage.contains("argument"), arity.getMessage)
  }
}
