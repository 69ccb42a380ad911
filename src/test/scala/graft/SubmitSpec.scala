package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.sinks.Sinks

/** The deployment entry ([[Submit]]) and its shipped conf template: the
  * cluster is one `conf/submit.sh <job> k=v...` away, so the spec pins the
  * pieces that must hold without a cluster — the template parses with the
  * cluster-shape keys present, the arg grammar works, and each registered
  * job dispatches the real composition (proven by running `batch` end to
  * end through the registry on a local session).
  */
class SubmitSpec extends SparkSpec {
  import spark.implicits._

  test("the shipped conf template parses and carries the cluster-shape keys") {
    val text = new String(
      Files.readAllBytes(Paths.get("conf/graft-submit.conf")), "UTF-8")
    val conf = Submit.parseConf(text)
    // the keys ops owns at deploy time; Submit must never override these
    val required = Seq(
      "spark.master", "spark.submit.deployMode",
      "spark.driver.port", "spark.blockManager.port",
      "spark.sql.shuffle.partitions", "spark.sql.files.maxPartitionBytes")
    required.foreach { k =>
      assert(conf.get(k).exists(_.nonEmpty), s"template missing $k")
    }
    assert(conf("spark.master").startsWith("spark://"),
      "template mirrors the reference's standalone-cluster master")
    assert(conf("spark.sql.shuffle.partitions").toInt >= 100,
      "deploy partitions must be cluster-shaped, not local-shaped")
  }

  test("arg grammar: key=value with '=' in values; errors name the offender") {
    assert(Submit.parseArgs(Seq("lake=s3a://x/y", "date=2026-08-14", "q=a=b")) ==
      Map("lake" -> "s3a://x/y", "date" -> "2026-08-14", "q" -> "a=b"))
    val e = intercept[IllegalArgumentException](Submit.parseArgs(Seq("boom")))
    assert(e.getMessage.contains("boom"))
  }

  test("the job registry exposes the reference's deployable jobs") {
    assert(Submit.jobs.keySet ==
      Set("batch", "stream", "ingest", "serve", "feedcard"))
  }

  test("serve mode=committed pins a live ingest loop's manifest through the public entry") {
    val root = Files.createTempDirectory("graft-submit-serve").toString
    val p = graft.pipeline.IngestPipeline.IngestPaths(s"$root/lake")
    val b0 = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val b1 = Seq((11L, "the rain in spain stays mainly on the plain")).toDF("doc_id", "text")
    assert(graft.pipeline.IngestPipeline.ingestBatch(spark, p, b0, 0L) == 2L)
    // serve pins batch 0, the loop keeps moving, the served output must not
    Submit.jobs("serve")(spark, Map(
      "mode" -> "committed", "root" -> p.root, "out" -> s"$root/out0"))
    assert(graft.pipeline.IngestPipeline.ingestBatch(spark, p, b1, 1L) == 1L)
    assert(spark.read.parquet(s"$root/out0").count() == 2L,
      "the pinned read captured the manifest BEFORE batch 1 committed")
    // an explicit earlier pin via upTo; the default pin sees both batches
    Submit.jobs("serve")(spark, Map(
      "mode" -> "committed", "root" -> p.root, "out" -> s"$root/out1", "upTo" -> "0"))
    assert(spark.read.parquet(s"$root/out1").count() == 2L)
    Submit.jobs("serve")(spark, Map(
      "mode" -> "committed", "root" -> p.root, "out" -> s"$root/out2"))
    assert(spark.read.parquet(s"$root/out2").count() == 3L)
  }

  test("serve mode=committed survives a compaction crossing the pin; a folded-away pin fails loudly") {
    // r16 stretch #8: the maintenance race. compactCommitted(upTo) folds
    // every __ver <= upTo partition INTO __ver=upTo, so a serve pinned AT
    // the fold boundary (the loop's own read point) must return the same
    // documents before and after the fold, while a serve pinned BELOW the
    // boundary — a read point the fold erased — must fail loudly instead
    // of silently writing an empty lake (the pre-r18 behavior: the
    // __ver <= pin filter matched nothing post-fold).
    val root = Files.createTempDirectory("graft-submit-race").toString
    val p = graft.pipeline.IngestPipeline.IngestPaths(s"$root/lake")
    assert(graft.pipeline.IngestPipeline.ingestBatch(spark, p,
      Seq((1L, "alpha beta gamma delta epsilon zeta"),
          (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text"),
      0L) == 2L)
    assert(graft.pipeline.IngestPipeline.ingestBatch(spark, p,
      Seq((11L, "the rain in spain stays mainly on the plain")).toDF("doc_id", "text"),
      1L) == 1L)
    assert(graft.pipeline.IngestPipeline.ingestBatch(spark, p,
      Seq((21L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text"),
      2L) == 1L)
    // the pinned read point BEFORE maintenance
    Submit.jobs("serve")(spark, Map(
      "mode" -> "committed", "root" -> p.root, "out" -> s"$root/pre", "upTo" -> "1"))
    val pre = spark.read.parquet(s"$root/pre")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(pre == Seq(1L, 2L, 11L))
    // maintenance folds batches 0..1 into __ver=1, CROSSING nothing the
    // pin needs: the same read point must serve the same documents
    graft.pipeline.IngestPipeline.compactCommitted(spark, p, 1L)
    Submit.jobs("serve")(spark, Map(
      "mode" -> "committed", "root" -> p.root, "out" -> s"$root/post", "upTo" -> "1"))
    assert(spark.read.parquet(s"$root/post")
      .select("doc_id").as[Long].collect().sorted.toSeq == pre)
    // the default pin (manifest high-water mark) still sees everything
    Submit.jobs("serve")(spark, Map(
      "mode" -> "committed", "root" -> p.root, "out" -> s"$root/all"))
    assert(spark.read.parquet(s"$root/all").count() == 4L)
    // a pin the fold ERASED fails loudly, not empty
    val e = intercept[IllegalArgumentException](Submit.jobs("serve")(spark, Map(
      "mode" -> "committed", "root" -> p.root, "out" -> s"$root/erased", "upTo" -> "0")))
    assert(e.getMessage.contains("compaction") || e.getMessage.contains("folded"),
      s"unexpected message: ${e.getMessage}")
  }

  test("serve mode=snapshot pins a SnapshotLake generation; bad modes fail loudly") {
    val root = Files.createTempDirectory("graft-submit-snap").toString
    val lake = s"$root/snap"
    graft.sinks.SnapshotLake.append(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), lake)
    graft.sinks.SnapshotLake.append(Seq((3L, "c")).toDF("id", "v"), lake)
    // default = current generation (both appends)
    Submit.jobs("serve")(spark, Map(
      "mode" -> "snapshot", "root" -> lake, "out" -> s"$root/cur"))
    assert(spark.read.parquet(s"$root/cur").count() == 3L)
    // an explicit pinned generation serves the first append only
    val gens = graft.sinks.SnapshotLake.generations(spark, lake)
    Submit.jobs("serve")(spark, Map(
      "mode" -> "snapshot", "root" -> lake, "out" -> s"$root/g0",
      "generation" -> gens.head.toString))
    assert(spark.read.parquet(s"$root/g0").count() == 2L)
    val e = intercept[RuntimeException](Submit.jobs("serve")(spark, Map(
      "mode" -> "nope", "root" -> lake, "out" -> s"$root/x")))
    assert(e.getMessage.contains("committed|snapshot"))
  }

  test("the batch job dispatches BatchPipeline end to end") {
    val root = Files.createTempDirectory("graft-submit").toString
    val events = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 5L, "click", 50.0, """{"k": 4}""", "2024-01-01"),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 6L, "purchase", 120.0, """{"k": 2}""", "2024-01-01"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props", "event_date")
    Sinks.writePartitionedLake(events, "event_date", s"$root/lake")
    Submit.jobs("batch")(spark, Map(
      "lake" -> s"$root/lake", "out" -> s"$root/out", "date" -> "2024-01-01"))
    assert(spark.read.parquet(s"$root/out/detail").count() == 2)
    assert(spark.read.parquet(s"$root/out/type_stats").count() > 0)
  }

  test("a missing required option fails with the option's name") {
    val e = intercept[RuntimeException](
      Submit.jobs("batch")(spark, Map("lake" -> "/nope")))
    assert(e.getMessage.contains("out"))
  }

  test("unknown/misspelled options are rejected, not silently ignored") {
    // a misspelled 'nearDup=true' used to parse fine and run the loop with
    // dedup OFF — the key sets name both the offender and the valid keys
    val bad = Submit.parseArgs(Seq("in=/a", "root=/b", "checkpoint=/c", "nearDup=true"))
    val unknown = bad.keySet -- Submit.jobKeys("ingest")
    assert(unknown == Set("nearDup"))
    // every advertised option of every job IS in its key set
    assert(Submit.jobKeys("batch") == Set("lake", "out", "date"))
    assert(Submit.jobKeys.keySet == Submit.jobs.keySet)
    // the round-11 scrub stage is deployable (and only under its exact key)
    assert(Submit.jobKeys("ingest").contains("spanscrub"))
    assert((Submit.parseArgs(Seq("spanScrub=true")).keySet --
      Submit.jobKeys("ingest")) == Set("spanScrub"))
    // the round-12 model gates are deployable
    assert(Set("qualitygate", "minScore", "perplexity")
      .subsetOf(Submit.jobKeys("ingest")))
  }

  test("qualitygate=true fails loudly when no model artifact is installed") {
    // the decontam contract: a configured-but-missing model must not start
    // an unguarded loop
    val e = intercept[Exception](
      Submit.jobs("ingest")(spark, Map(
        "in" -> "/a", "root" -> "/tmp/graft-no-such-root", "checkpoint" -> "/c",
        "qualitygate" -> "true")))
    assert(e.getMessage != null)
  }

  test("the retrieval-decontamination stage is deployable by its index path") {
    // the stage's deploy keys exist (a stage an operator cannot switch on
    // through the public entry is not deployed)
    assert(Set("retrievalIndex", "retrievalThreshold", "retrievalFailOpen")
      .subsetOf(Submit.jobKeys("ingest")))
    // end to end through the public entry against a REAL index: the
    // streaming loop drops the near-verbatim eval copy, lands the clean doc
    val root = Files.createTempDirectory("graft-submit-rd").toString
    val evals = (0L until 10L).map { i =>
      (900L + i, (0 until 8).map(j => s"ev${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    graft.functions.Bm25.buildIndex(evals, "text", "doc_id", s"$root/idx", ngram = 2)
    Seq(
      (31L, "edited " + (0 until 8).map(j => s"ev0x$j").mkString(" ")),
      (32L, "fresh clean content with no suite overlap at all"))
      .toDF("doc_id", "text")
      .write.parquet(s"$root/in")
    Submit.jobs("ingest")(spark, Map(
      "in" -> s"$root/in", "root" -> s"$root/lake", "checkpoint" -> s"$root/ckpt",
      "retrievalIndex" -> s"$root/idx"))
    spark.streams.active.foreach { q => q.processAllAvailable(); q.stop() }
    assert(spark.read.parquet(s"$root/lake/doc_lake")
      .select("doc_id").as[Long].collect().toSeq == Seq(32L),
      "the near-verbatim eval copy must be screened out by the deployed stage")
  }

  test("the feed-cardinality monitor deploys through the public entry") {
    assert(Submit.jobKeys("ingest").contains("cardK"))
    val root = Files.createTempDirectory("graft-submit-card").toString
    (1L to 6L).map(i => (i, s"card doc $i with tokens ${i % 3} here"))
      .toDF("doc_id", "text")
      .write.parquet(s"$root/in")
    Submit.jobs("ingest")(spark, Map(
      "in" -> s"$root/in", "root" -> s"$root/lake",
      "checkpoint" -> s"$root/ckpt", "cardK" -> "4"))
    spark.streams.active.foreach { q => q.processAllAvailable(); q.stop() }
    // 6 distinct feed texts under k=4 -> saturated estimator path
    val s = graft.pipeline.IngestPipeline.feedCardinality(
      spark, graft.pipeline.IngestPipeline.IngestPaths(s"$root/lake"))
    assert(s.n_min == 4L && s.kth > 0L)
    Submit.jobs("feedcard")(spark, Map("root" -> s"$root/lake")) // prints, no throw
  }

  test("boolean options are strict: neardup=1 fails loudly instead of meaning false") {
    // case-insensitive true/false accepted; anything else is an error, not
    // a silent "stage off"
    val e = intercept[RuntimeException](
      Submit.jobs("ingest")(spark, Map(
        "in" -> "/a", "root" -> "/b", "checkpoint" -> "/c", "neardup" -> "1")))
    assert(e.getMessage.contains("true or false"), e.getMessage)
  }

  test("parseConf accepts every java.util.Properties separator spark-submit accepts") {
    val conf = Submit.parseConf(
      """# comment
        |spark.master spark://h:7077
        |spark.executor.memory=4g
        |spark.driver.host : driver.local
        |spark.eventLog.enabled  =  true
        |""".stripMargin)
    assert(conf == Map(
      "spark.master" -> "spark://h:7077",
      "spark.executor.memory" -> "4g",
      "spark.driver.host" -> "driver.local",
      "spark.eventLog.enabled" -> "true"))
  }
}
