package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val model = QualityClassifier.Model(
    QualityClassifier.synthesizeWeights(QualityClassifier.DefaultDim), bias = 0L)

  /** Independent in-test recomputation: Spark-SQL hash formula (the shared
    * md5 contract) + the weight formula, per feature — the oracle's path,
    * executed here over literal columns rather than the scorer object.
    */
  private def expectedScore(text: String): (Long, Long) = {
    val toks = text.split(" ", -1).toSeq
    val feats = toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
    val dim = model.dim
    val wsum = feats.map { f =>
      val h = spark.sql(
        s"SELECT CAST(conv(substring(md5('${f.replace("'", "''")}'), 1, 15), 16, 10) AS LONG)")
        .head().getLong(0)
      val j = h % dim
      (j * QualityClassifier.WeightMultiplier) % QualityClassifier.WeightModulus -
        QualityClassifier.WeightOffset
    }.sum
    (feats.size.toLong, wsum)
  }

  test("featureSum matches the hash+weight formula on a battery") {
    val battery = Seq("alpha beta gamma", "one", "", "a  b", "x y x y x")
    val out = battery.zipWithIndex.map(_.swap).toDF("id", "text")
      .select(col("id"), QualityClassifier.featureSum(col("text"), model).as("s"))
      .select(col("id"), col("s.n_feats"), col("s.wsum"))
      .orderBy("id").as[(Int, Long, Long)].collect()
    for ((text, i) <- battery.zipWithIndex) {
      val (nf, ws) = expectedScore(text)
      assert(out(i)._2 == nf, s"n_feats for '$text'")
      assert(out(i)._3 == ws, s"wsum for '$text'")
    }
  }

  test("unigram+bigram feature count: 2n-1, empty-token contract included") {
    val out = Seq((1, "a b c"), (2, ""), (3, "a  b"))
      .toDF("id", "text")
      .select(col("id"), QualityClassifier.featureSum(col("text"), model).as("s"))
      .select(col("id"), col("s.n_feats")).orderBy("id")
      .as[(Int, Long)].collect().toMap
    assert(out(1) == 5L) // 3 unigrams + 2 bigrams
    assert(out(2) == 1L) // [""] -> 1 unigram, 0 bigrams
    assert(out(3) == 5L) // "a","","b" -> 3 + 2 (double space yields empty token)
  }

  test("classify thresholds at minScoreE4 and scores are replay-stable") {
    val docs = (0L until 64L).map(i => (i, s"doc $i token${i % 7} " * (1 + (i % 5).toInt)))
      .toDF("doc_id", "text")
    val a = QualityClassifier.classify(docs, "text", model).orderBy("doc_id").collect()
    val b = QualityClassifier.classify(docs.repartition(5), "text", model)
      .orderBy("doc_id").collect()
    assert(a.toSeq == b.toSeq, "partitioning must not change scores")
    assert(a.forall(r => (r.getAs[Long]("score_e4") >= 0L) ==
      (r.getAs[String]("label") == "keep")))
    // both classes occur (symmetric weights -> mean near zero)
    assert(a.map(_.getAs[String]("label")).distinct.length == 2)
  }

  test("score_e4 is the half-up fixed-point mean incl. bias") {
    val m = QualityClassifier.Model(Array.fill(16)(3L), bias = 5L)
    // every bucket weighs 3: text "a b" -> 3 feats -> wsum 9, score =
    // half-up((9+5)*10000 / 3) = half-up(46666.67) = 46667
    val s = Seq((1, "a b")).toDF("id", "text")
      .select(QualityClassifier.scoreE4(col("text"), m).as("s"))
      .head().getLong(0)
    assert(s == 46667L)
  }

  test("negative scores round half-up consistently (floor-division contract)") {
    val m = QualityClassifier.Model(Array.fill(16)(-1L), bias = 0L)
    // "a b c" -> 5 feats, wsum -5, score = half-up(-50000/5) = -10000
    val s1 = Seq((1, "a b c")).toDF("id", "text")
      .select(QualityClassifier.scoreE4(col("text"), m).as("s")).head().getLong(0)
    assert(s1 == -10000L)
    // wsum -1 over 3 feats: -10000/3 = -3333.33 -> half-up -> -3333
    val m2 = QualityClassifier.Model(Array.fill(16)(0L), bias = -1L)
    val s2 = Seq((1, "a b")).toDF("id", "text")
      .select(QualityClassifier.scoreE4(col("text"), m2).as("s")).head().getLong(0)
    assert(s2 == -3333L)
  }

  test("model round-trips through the persisted (bucket, weight) table") {
    val dir = java.nio.file.Files.createTempDirectory("qc_model").toString
    val m = QualityClassifier.Model(QualityClassifier.synthesizeWeights(64), bias = 7L)
    QualityClassifier.writeModel(spark, m, s"$dir/model")
    val rt = QualityClassifier.readModel(spark, s"$dir/model")
    assert(rt.bias == 7L && rt.weights.toSeq == m.weights.toSeq)
  }

  test("null text yields null struct") {
    val out = Seq((1L, null: String)).toDF("id", "text")
      .select(QualityClassifier.featureSum(col("text"), model).as("s")).collect()
    assert(out(0).isNullAt(0))
  }
}
