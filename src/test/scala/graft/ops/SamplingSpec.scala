package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("splitLabel is a pure function of the key and covers all three splits") {
    val df = (0L until 1000L).toDF("id")
    val once = df.select(col("id"), Sampling.splitLabel(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    val twice = df.orderBy(col("id").desc).repartition(7)
      .select(col("id"), Sampling.splitLabel(col("id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(once == twice) // layout-independent
    val dist = once.values.groupBy(identity).view.mapValues(_.size).toMap
    // 80/10/10 within generous tolerance on 1000 keys
    assert(dist("train") > 700 && dist("val") > 50 && dist("test") > 50, dist.toString)
  }

  test("sampleByHash keeps a stable subset") {
    val df = (0L until 500L).toDF("id")
    val s10 = Sampling.sampleByHash(df, "id", 10).as[Long].collect().toSet
    val s20 = Sampling.sampleByHash(df, "id", 20).as[Long].collect().toSet
    assert(s10.subsetOf(s20)) // nested by construction
    assert(s10.nonEmpty && s20.size < 200)
  }

  test("salted decisions decorrelate: a hash-sampled corpus still splits three ways") {
    val df = (0L until 2000L).toDF("id")
    // the documented composition trap: an UNSALTED 10% sample keeps exactly
    // buckets 0-9, so an unsalted 80/10/10 split over it is 100% train
    val unsalted = Sampling.sampleByHash(df, "id", 10)
      .select(Sampling.splitLabel(col("id")).as("s"))
      .distinct().as[String].collect().toSet
    assert(unsalted == Set("train"), s"trap no longer reproduces: $unsalted")
    // a salted split over the same sample is an independent decision
    val salted = Sampling.sampleByHash(df, "id", 10)
      .select(Sampling.splitLabel(col("id"), salt = "split-v1").as("s"))
      .as[String].collect()
    val dist = salted.groupBy(identity).view.mapValues(_.size).toMap
    assert(dist.keySet == Set("train", "val", "test"), dist.toString)
    assert(dist("train") > salted.length / 2, dist.toString)
    // the default salt is the original assignment — values pinned
    val a = df.select(Sampling.hashBucket(col("id")).as("b")).as[Long].collect()
    val b = df.select(Sampling.hashBucket(col("id"), salt = "").as("b")).as[Long].collect()
    assert(a.sameElements(b))
  }

  test("splitLabel routes null keys to train; sampleByHash drops them") {
    val df = Seq(Some(1L), Some(2L), None).toDF("id")
    val labels = df.select(col("id"), Sampling.splitLabel(col("id")).as("s"))
      .as[(Option[Long], String)].collect().toMap
    // a null key must never land in an eval split
    assert(labels(None) == "train", labels.toString)
    assert(Sampling.sampleByHash(df, "id", 99).filter(col("id").isNull).count() == 0)
  }

  test("sampleByStratum: per-stratum rates, nested across rate changes, layout-independent") {
    val df = (0L until 2000L).toDF("id")
      .withColumn("src", when(col("id") % 3 === 0, "a").when(col("id") % 3 === 1, "b").otherwise("c"))
    val out = Sampling.sampleByStratum(df, "id", "src",
      Map("a" -> 10000, "b" -> 0), defaultE4 = 3000)
      .as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("a", 0) == 667)           // rate 10000 keeps everything
    assert(!bySrc.contains("b"))                     // rate 0 drops everything
    val c = bySrc.getOrElse("c", 0)
    assert(c > 120 && c < 280, s"~30% of 666 expected, got $c")
    // nested: raising c's rate only ADDS rows, never reshuffles the sample
    val wider = Sampling.sampleByStratum(df, "id", "src",
      Map("a" -> 10000, "b" -> 0), defaultE4 = 6000)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(out.map(_._1).toSet.subsetOf(wider))
    // layout-independent: same rows after a repartition
    val reshuffled = Sampling.sampleByStratum(df.repartition(13), "id", "src",
      Map("a" -> 10000, "b" -> 0), defaultE4 = 3000)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(reshuffled == out.map(_._1).toSet)
  }

  test("contaminationReport flags eval docs sharing a long verbatim run with train") {
    // discover which keys splitLabel assigns where, then build the scenario
    val splits = (0L until 200L).toDF("doc_id")
      .select(col("doc_id"), Sampling.splitLabel(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    val train = splits.collect { case (k, "train") => k }.toSeq.sorted
    val eval = splits.collect { case (k, s) if s != "train" => k }.toSeq.sorted
    val leaked = "one two three four five six seven eight nine ten"
    val docs = Seq(
      train.head -> s"$leaked and some train only trailing text here",
      train(1) -> "completely unrelated training content with many different words",
      eval.head -> s"prefix words then $leaked appears verbatim in eval",
      eval(1) -> "clean evaluation document with no overlap at all whatsoever")
      .toDF("doc_id", "text")
    val out = Sampling.contaminationReport(docs, "text", "doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(eval.head), s"only the leaked eval doc flags: $out")
    assert(out.head._3 == 1L && out.head._4 >= 1L) // one train collider, ≥1 shared fp
  }

  test("takePerStratum: exact n per stratum, content-stable across partitionings, null keys dropped") {
    val df = (1L to 200L).map(i => (i, s"s${i % 3}"))
      .toDF("id", "stratum")
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], "s0"))
        .toDF("id", "stratum").select(col("id").cast("long"), col("stratum")))
    val a = Sampling.takePerStratum(df, "id", "stratum", n = 10, salt = "t1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a.size == 30)
    a.groupBy(_._2).foreach { case (_, rows) => assert(rows.size == 10) }
    // content-stable: any partitioning draws the SAME sample
    val b = Sampling.takePerStratum(df.repartition(32), "id", "stratum", n = 10, salt = "t1")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b)
    // a different salt draws a different (decorrelated) sample
    val c = Sampling.takePerStratum(df, "id", "stratum", n = 10, salt = "t2")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a != c)
    // n beyond the stratum size keeps everything (no padding, no error)
    assert(Sampling.takePerStratum(df, "id", "stratum", n = 1000, salt = "t1").count() == 200L)
  }

  test("trainingOrder is a reproducible permutation; salts decorrelate epochs") {
    import spark.implicits._
    val docs = (0L until 300L).map(Tuple1(_)).toDF("doc_id")
    val e0 = Sampling.trainingOrder(docs, "doc_id", shards = 8, salt = "e0")
      .select("doc_id").as[Long].collect().toSeq
    // a permutation of the corpus, not the input order
    assert(e0.sorted == (0L until 300L))
    assert(e0 != (0L until 300L).toSeq)
    // reproducible across partitionings (shard-writer contract)
    val e0b = Sampling.trainingOrder(docs.repartition(7), "doc_id", 8, "e0")
      .select("doc_id").as[Long].collect().toSeq
    assert(e0 == e0b)
    // a new salt is a fresh permutation
    val e1 = Sampling.trainingOrder(docs, "doc_id", 8, "e1")
      .select("doc_id").as[Long].collect().toSeq
    assert(e0 != e1 && e1.sorted == (0L until 300L))
    // shard comes from the hash: stable under reordering, roughly balanced
    val shardSizes = Sampling.trainingOrder(docs, "doc_id", 8, "e0")
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    assert(shardSizes.size == 8 && shardSizes.values.forall(c => c > 10 && c < 80),
      shardSizes.toString)
  }

  test("semanticCarve draws n per persisted IVF cell, content-stably") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semcarve").toString
    // two orthogonal clusters of 30 vectors each -> 2 cells
    val emb = (0L until 60L).map { i =>
      val v = if (i % 2 == 0) Array(1f, 0f, 0f, 0f) else Array(0f, 1f, 0f, 0f)
      (i, v.map(x => x + (i % 7) * 0.001f).toSeq)
    }.toDF("vec_id", "embedding").select(col("vec_id"),
      col("embedding").cast("array<float>").as("embedding"))
    val cents = graft.functions.Similarity.kmeansCentroids(emb, k = 2, iters = 2)
    graft.functions.Similarity.writeIvfIndex(emb, cents, s"$dir/idx")
    val a = Sampling.semanticCarve(spark, s"$dir/idx", n = 5, salt = "s")
      .orderBy("cell_id", "vec_id").as[(Long, Long)].collect().toSeq
    assert(a.groupBy(_._1).forall(_._2.size == 5), s"5 per cell, got $a")
    assert(a.map(_._1).distinct.size == 2)
    // replay draws the identical carve (pure function of the lists)
    val b = Sampling.semanticCarve(spark, s"$dir/idx", n = 5, salt = "s")
      .orderBy("cell_id", "vec_id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("upsampleByStratum: whole epochs are unconditional, fractions hit the expected rate") {
    import spark.implicits._
    val docs = (0L until 4000L).map(i =>
      (i, if (i % 2 == 0) "hot" else "cold")).toDF("id", "src")
    val out = Sampling.upsampleByStratum(docs, "id", "src",
      Map("hot" -> 23000, "cold" -> 4000), salt = "mix")
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    // hot: 2000 keys x 2.3 epochs = ~4600; cold: 2000 x 0.4 = ~800
    assert(bySrc("hot") >= 2000L * 2, "every hot key must emit 2 full replicas")
    assert(math.abs(bySrc("hot") - 4600L) < 200, bySrc.toString)
    assert(math.abs(bySrc("cold") - 800L) < 150, bySrc.toString)
    // replica identity: (key, replica) unique; full replicas present for all
    assert(out.count() == out.select("id", "replica").distinct().count())
    val hotFull = out.filter(col("src") === "hot" && col("replica") < 2).count()
    assert(hotFull == 4000L)
  }

  test("upsampleByStratum is monotone in the rate and content-stable under repartitioning") {
    import spark.implicits._
    val docs = (0L until 1500L).map(i => (i, "s")).toDF("id", "src")
    def draw(rate: Int, parts: Int) =
      Sampling.upsampleByStratum(docs.repartition(parts), "id", "src",
        Map("s" -> rate), salt = "m")
        .select("id", "replica").as[(Long, Long)].collect().toSet
    val at13 = draw(13000, 3)
    val at13b = draw(13000, 11)
    assert(at13 == at13b, "partitioning must not change the draw")
    // raising the rate only ADDS replicas
    val at17 = draw(17000, 5)
    assert(at13.subsetOf(at17),
      s"lost replicas on a rate raise: ${at13.diff(at17).take(5)}")
    // crossing the next whole epoch freezes the fractional replica in
    val at20 = draw(20000, 4)
    assert(at17.subsetOf(at20) && at20.size == 1500 * 2)
  }

  test("upsampleByStratum: rate 0 strata vanish, null keys drop, null strata take the default") {
    import spark.implicits._
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "gone"), (java.lang.Long.valueOf(2L), "kept"),
      (null.asInstanceOf[java.lang.Long], "kept"), (java.lang.Long.valueOf(3L), null))
      .toDF("id", "src")
    val out = Sampling.upsampleByStratum(docs, "id", "src",
      Map("gone" -> 0, "kept" -> 10000), defaultE4 = 10000, salt = "z")
      .select("id", "src").as[(Long, String)].collect().toSet
    assert(out == Set((2L, "kept"), (3L, null)), out.toString)
  }
}
