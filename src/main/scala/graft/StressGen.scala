package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** sf1-scale stress evidence for the dedup/ANN family (VERDICT r2 #8):
  * synthesizes a 10× corpus from the driver's sf0.1 tables (into
  * `target/sf1/` — the driver testdata dir is read-only), then runs the
  * q26 (MinHash/LSH pairs), q29 (LSH ANN pairs) and q48 (duplicate
  * clusters) pipelines against it, printing wall times, result sizes and
  * CC round counts.
  *
  * Replication is adversarial for dedup, not a no-op copy: each document
  * replica appends a replica marker token, so every original spawns a
  * 10-clique of TRUE near-duplicates (pairwise Jaccard ≈ 0.95-0.99 —
  * right at the banding threshold) on top of the corpus's own near-dup
  * structure; embeddings replicate exactly (cosine 1.0 cliques) which
  * drives maximal LSH bucket collisions under the bucket-size cap.
  */
object StressGen {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "target/sf1"
    val copies = 10
    val spark = GraftSession.builder("graft-stress", shufflePartitions = 32)
      .master("local[32]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(outDir), spark.sparkContext.hadoopConfiguration)
    val reps = spark.range(copies).select(F.col("id").as("__rep"))
    // PER-OUTPUT existence checks: a single guard on documents.parquet let
    // a run killed between the two writes permanently skip regenerating the
    // missing embeddings half on every later attempt (review finding). The
    // _SUCCESS marker (not the bare directory) is the completion stamp, so
    // a killed mid-write corpus regenerates too.
    def complete(name: String): Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(s"$outDir/$name/_SUCCESS"))
    if (!complete("documents.parquet")) {
      val docs = spark.read.parquet(s"$srcDir/documents.parquet")
      val nDocs = docs.agg(F.max("doc_id")).head.getLong(0) + 1
      docs.crossJoin(reps)
        .select(
          (F.col("doc_id") + F.col("__rep") * nDocs).as("doc_id"),
          F.when(F.col("__rep") === 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("__rep"))).as("text"),
          F.col("lang"), F.col("n_chars"))
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }
    if (!complete("embeddings.parquet")) {
      val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
      val nVecs = emb.agg(F.max("vec_id")).head.getLong(0) + 1
      emb.crossJoin(reps)
        .select((F.col("vec_id") + F.col("__rep") * nVecs).as("vec_id"), F.col("embedding"))
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    // 10× events with a DELIBERATE hot key: replicas shift user ids into
    // fresh ranges, except every 5th event of each non-zero replica, which
    // lands on user 0 — so user 0 accumulates ~18% of the replicated corpus
    // (the one-pathological-key shape the salted as-of/window variants
    // exist for), while the rest keeps realistic per-user cardinality.
    if (!complete("events_stress.parquet")) {
      val ev = sources.Tables.events(spark, srcDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      val nEv = ev.agg(F.max("event_id")).head.getLong(0) + 1
      val nUsers = ev.agg(F.max("user_id")).head.getLong(0) + 1
      ev.crossJoin(reps)
        .select(
          (F.col("event_id") + F.col("__rep") * nEv).as("event_id"),
          F.col("ts"),
          F.when(F.col("__rep") > 0 && F.pmod(F.col("event_id"), F.lit(5)) === 0, 0L)
            .otherwise(F.col("user_id") + F.col("__rep") * nUsers).as("user_id"),
          F.col("event_type"), F.col("value"))
        .write.mode("overwrite").parquet(s"$outDir/events_stress.parquet")
    }
    val nd = spark.read.parquet(s"$outDir/documents.parquet").count()
    val nv = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    val ne = spark.read.parquet(s"$outDir/events_stress.parquet").count()
    val nHot = spark.read.parquet(s"$outDir/events_stress.parquet")
      .filter(F.col("user_id") === 0).count()
    println(s"GRAFT_STRESS corpus: $nd docs, $nv vectors, $ne events " +
      f"($nHot on the hot key = ${100.0 * nHot / ne}%.1f%%) at $outDir")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"GRAFT_STRESS $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = sources.Tables.documents(spark, outDir)
    val embs = sources.Tables.embeddings(spark, outDir)

    val pairs = time("q26_minhash_pairs (10x corpus)") {
      val p = functions.Dedup.minhashCandidates(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"GRAFT_STRESS   candidate pairs: ${p.count()}")
      p
    }
    time("q48_dup_clusters CC (on those pairs)") {
      val (labels, rounds) = functions.Dedup.duplicateClustersLogNWithRounds(pairs)
      val n = labels.count()
      val k = labels.select("rep").distinct().count()
      println(s"GRAFT_STRESS   $n labeled nodes, $k clusters, $rounds CC rounds")
    }
    // pairs is consumed only by the two sections above — cached 10x-corpus
    // candidate blocks left resident would evict into every LATER timed
    // section and skew the very walls this harness prints as evidence
    // (review finding; Bench clears cache after each query for the same
    // reason)
    pairs.unpersist(blocking = false)
    time("q29_lsh_ann_pairs (10x corpus)") {
      val p = functions.Similarity
        .lshCandidatePairs(embs, dims = 64, nBits = 12, seed = 7L)
      println(s"GRAFT_STRESS   ann pairs: ${p.count()}")
    }
    time("q63_int8_ann (10x corpus, 100 queries)") {
      // int8 vs float brute-force top-10 over the 10× vector corpus:
      // recall@10 measures what the 4× memory saving costs in ranking
      // fidelity (exact-duplicate cliques from the replication make the
      // true neighbors unambiguous)
      val queries = embs.filter(F.col("vec_id") < 100)
      val i8 = functions.Similarity.int8TopK(embs, queries, 10)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val fl = functions.Similarity.bruteForceTopK(embs, queries, 10)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val overlap = i8.intersect(fl).count()
      val total = fl.count()
      println(f"GRAFT_STRESS   recall@10 vs float: $overlap/$total = ${100.0 * overlap / total}%.1f%%")
    }
    time("q55_decontamination (10x corpus)") {
      val n = ops.Sampling.contaminationReport(docs, "text", "doc_id").count()
      println(s"GRAFT_STRESS   contaminated eval docs: $n")
    }
    time("q57_incremental_dedup (10x corpus)") {
      val history = docs.filter(F.col("doc_id") % 2 === 0)
      val incoming = docs.filter(F.col("doc_id") % 2 === 1).select("doc_id", "text")
        .unionByName(docs.filter(F.col("doc_id") % 10 === 0)
          .select((F.col("doc_id") + 10000000L).as("doc_id"), F.col("text")))
      val kept = functions.Dedup.dedupAgainstHistory(history, incoming).count()
      println(s"GRAFT_STRESS   kept after history-dedup: $kept")
    }
    time("q75_sequence_packing (10x corpus, derived shards)") {
      // shards derives from defaultParallelism (32 here): the running sum
      // splits into 32 independent streams, so the window exchange carries
      // narrow (id, shard, n_tokens) rows across 32-way parallelism — the
      // per-shard row counts printed below must stay balanced (each shard
      // is id % 32, so ±1 of corpus/32) for the flat-cost claim to hold
      val packed = ops.Packing.packSequences(docs, "text", "doc_id").cache()
      val shardSizes = packed.groupBy("shard").count()
        .agg(F.count(F.lit(1)), F.min("count"), F.max("count")).head
      val windows = packed.agg(F.sum("n_windows")).head.getLong(0)
      packed.unpersist()
      println(s"GRAFT_STRESS   shards: ${shardSizes.getLong(0)} " +
        s"(rows/shard ${shardSizes.getLong(1)}..${shardSizes.getLong(2)}), " +
        s"doc-window assignments: $windows")
    }
    // ---- round-4 families: as-of under a hot key, session windows, TF-IDF,
    // winnowing (salted parity) ----
    val evStress = spark.read.parquet(s"$outDir/events_stress.parquet")
    val ordersDedup = ops.Cleaning.dedupByKey(
      sources.Tables.orders(spark, srcDir),
      Seq("o_custkey", "o_orderdate"), Seq(F.col("o_orderkey").desc))
    def asOfChecksum(joined: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = joined
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.coalesce(F.col("o_orderkey"), F.lit(-1L))).as("s"))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val plain = time("q36_asof (10x skewed events, unsalted)") {
      asOfChecksum(ops.AsOfJoin.asOf(evStress, ordersDedup,
        "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey")))
    }
    val salted = time("q36_asof_salted nSalts=32 (same input)") {
      asOfChecksum(ops.AsOfJoin.asOfSalted(evStress, ordersDedup,
        "user_id", "o_custkey", "ts", "o_orderdate", Seq("o_orderkey"), nSalts = 32))
    }
    println(s"GRAFT_STRESS   asof checksums plain=$plain salted=$salted " +
      s"equal=${plain == salted}")
    time("q40_session_windows (10x skewed events)") {
      val n = evStress
        .groupBy(F.col("user_id"), F.session_window(F.col("ts"), "30 minutes"))
        .agg(F.count(F.lit(1)).as("n_events"))
        .count()
      println(s"GRAFT_STRESS   sessions: $n")
    }
    time("q50_tfidf_top_terms (10x corpus)") {
      val n = functions.Text.tfidfTopTerms(docs, "text", "doc_id", 3).count()
      println(s"GRAFT_STRESS   top-term rows: $n")
    }
    time("q54_winnow salted-parity (10x corpus)") {
      val a = functions.Text.winnowFingerprints(docs, "text", "doc_id").count()
      val b = functions.Text.winnowFingerprintsSalted(docs, "text", "doc_id", chunkSize = 64)
        .count()
      println(s"GRAFT_STRESS   fingerprints plain=$a salted=$b equal=${a == b}")
    }
    time("q59_boilerplate_filter (10x corpus)") {
      // the 10× replication is adversarial here too: every original's
      // shared grams now sit in ≥10 documents, right at the df threshold
      // managed form: the soak loop must not accumulate one cached perDoc
      // relation per pass (the raw form's documented cache contract)
      functions.Text.boilerplateStatsManaged(docs, "text", "doc_id") { out =>
        val scored = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = scored.count()
        val kept = scored.filter(F.col("keep") === 1).count()
        scored.unpersist()
        println(s"GRAFT_STRESS   docs scored: $n, kept: $kept")
      }
    }
    time("q59 adversarial all-boiler vocabulary (guarded broadcast)") {
      // every doc shares every gram, so the boilerplate vocabulary is
      // gram-count-sized instead of tiny — the r5-verdict scenario where an
      // unconditional broadcast hint would hazard driver memory at corpus
      // scale. maxBroadcastVocab=0 forces the no-hint path a genuinely
      // oversized vocabulary takes; the row passing = the plan completes on
      // AQE's sizing with every doc correctly dropped.
      val adv = docs.select(F.col("doc_id"),
        F.lit((1 to 40).map(i => s"g$i").mkString(" ")).as("text"))
      functions.Text.boilerplateStatsManaged(adv, "text", "doc_id",
        maxBroadcastVocab = 0L) { scored =>
        val n = scored.count()
        val dropped = scored.filter(F.col("keep") === 0).count()
        println(s"GRAFT_STRESS   adversarial docs: $n, dropped: $dropped, allDropped=${n == dropped}")
      }
    }
    time("q99 domain-cap auto degrade at adversarial n/cap (exact == sketch)") {
      // cap=20 over the 10x corpus pushes the lossless sketch capacity to
      // n/20; maxCapacity=1024 is deliberately far below that, forcing
      // capPerDomainAuto onto the fully-distributed exact path (round-12
      // advice: the auto capacity must have a memory envelope). The row
      // pins the degrade lossless: both paths keep the identical doc set.
      val hosts = docs.select(F.col("doc_id"),
        F.when(F.col("doc_id") % 3 === 0, F.lit("hub"))
          .otherwise(F.concat(F.lit("site"), (F.col("doc_id") % 40).cast("string")))
          .as("host"))
      def sig(df: org.apache.spark.sql.DataFrame) = df
        .agg(F.count(F.lit(1)), F.bit_xor(F.xxhash64(F.col("host"), F.col("doc_id"))))
        .head()
      val ex = sig(ops.UrlOps.capPerDomainAuto(
        hosts, "host", "doc_id", cap = 20, salt = "soak", maxCapacity = 1024))
      val sk = sig(ops.UrlOps.capPerDomainAuto(
        hosts, "host", "doc_id", cap = 20, salt = "soak"))
      println(s"GRAFT_STRESS   kept=${ex.get(0)} equal=${ex == sk}")
    }
    // ---- round-5 family: multimodal codecs at 10× — a mixed PNG/WAV/GIF
    // corpus (one kind per doc_id mod 3) with a deterministic corrupt
    // fraction (every 17th blob truncated to a quarter), exercising encode,
    // probe/decode, quarantine routing and frame sampling. In local mode
    // executors share this JVM, so /proc/self/fd watches the WHOLE codec
    // path: a leaked ImageIO/audio stream anywhere shows up as monotone fd
    // growth across the passes (the Multimodal withReader/encodeGif
    // try/finally guards are what keep it flat). ----
    def openFds(): Long = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get("/proc/self/fd"))
      try s.count() finally s.close()
    }
    locally {
      import spark.implicits._
      val ids = docs.select(F.col("doc_id"))
      def corrupt(ds: org.apache.spark.sql.Dataset[multimodal.Multimodal.MediaRecord]) =
        ds.map { m =>
          if (m.media_id % 17 == 0)
            m.copy(bytes = m.bytes.take(math.max(1, m.bytes.length / 4)))
          else m
        }
      val imgs = corrupt(multimodal.Multimodal.synthesizeImages(
        ids.filter(F.col("doc_id") % 3 === 0), "doc_id"))
      val auds = corrupt(multimodal.Multimodal.synthesizeAudio(
        ids.filter(F.col("doc_id") % 3 === 1), "doc_id"))
      val vids = corrupt(multimodal.Multimodal.synthesizeVideos(
        ids.filter(F.col("doc_id") % 3 === 2), "doc_id"))
      val fd0 = openFds()
      time("q37_media_features (10x mixed media corpus + corrupt fraction)") {
        val feats = multimodal.Multimodal.extractFeatures(imgs.unionByName(auds).unionByName(vids))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = feats.count()
        // healthy dims are formula-bounded (< 33 px) or 0 (audio); the
        // quarantine marker starts at 64 — so width >= 64 counts the blobs
        // no real codec could parse
        val quarantined = feats.filter(F.col("width") >= 64).count()
        val mb = feats.agg(F.sum("n_bytes")).head.getLong(0) / (1 << 20)
        feats.unpersist()
        println(s"GRAFT_STRESS   blobs decoded: $n ($mb MiB payload), quarantined: $quarantined")
      }
      time("q38_frame_samples (10x video corpus + corrupt fraction)") {
        val frames = multimodal.Multimodal.sampleFrames(vids, maxFrames = 4)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = frames.count()
        val qRows = frames.filter(F.col("n_frames") === 0).count()
        frames.unpersist()
        println(s"GRAFT_STRESS   frame rows: $n, quarantine rows: $qRows")
      }
      val fd1 = openFds()
      println(s"GRAFT_STRESS   open fds before=$fd0 after=$fd1 delta=${fd1 - fd0}")
    }
    // ---- round-7 family: the incremental serving operators at 10× —
    // the multi-batch ingest loop (fp-index dedup + versioned lake +
    // manifest), fragmented-partition compaction, and IVF append. What the
    // rows certify: per-batch ingest cost stays FLAT while history grows
    // (the amortization q69 exists for), compaction is content-preserving
    // with the predicted file count, and serve-after-append is row-identical
    // to the in-memory composition over the full 10× corpus. ----
    time("q73_ingest_loop (10x corpus, 8 batches, 10% replay fraction)") {
      val root = s"$outDir/ingest10x"
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val paths = pipeline.IngestPipeline.IngestPaths(root)
      val nB = 8
      var landed = 0L
      for (i <- 0 until nB) {
        val own = docs.filter(F.pmod(F.col("doc_id"), F.lit(nB)) === i)
          .select("doc_id", "text")
        // every batch after the first replays ~10% of the PREVIOUS batch's
        // content under fresh ids — the cross-batch duplicates the fp probe
        // must reject
        val b =
          if (i == 0) own
          else own.unionByName(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(nB)) === (i - 1) &&
                F.pmod(F.col("doc_id"), F.lit(10 * nB)) === (i - 1))
              .select((F.col("doc_id") + 90000000L).as("doc_id"), F.col("text")))
        val t0 = System.nanoTime()
        val n = pipeline.IngestPipeline.ingestBatch(spark, paths, b, i.toLong)
        landed += n
        println(f"GRAFT_STRESS   batch $i: accepted $n in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
          s"(history=${landed - n} docs at probe time)")
      }
      // the pipeline's OWN acceptance rule, not a hand-copied token-bound
      // predicate: a future quality-gate change would silently desync the
      // oracle and flag healthy runs (review finding)
      val expected = pipeline.IngestPipeline.qualityFilter(docs)
        .select("text").distinct().count()
      val lake = spark.read.parquet(paths.docLake).count()
      val idx = spark.read.parquet(paths.fpIndex).count()
      println(s"GRAFT_STRESS   landed=$landed lake=$lake fpIndex=$idx " +
        s"expectedUnique=$expected allEqual=${landed == expected && lake == expected && idx == expected}")
      // lake maintenance at the same scale: fold the first 7 committed
      // partitions (intent-logged swap) and prove content survives
      val t1 = System.nanoTime()
      pipeline.IngestPipeline.compactCommitted(spark, paths, (nB - 2).toLong)
      val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(paths.docLake))
        .count(_.getPath.getName.startsWith("__ver="))
      val afterFold = spark.read.parquet(paths.docLake).count()
      println(f"GRAFT_STRESS   compactCommitted(upTo=${nB - 2}): ${(System.nanoTime() - t1) / 1e9}%.1f s, " +
        s"partitions $nB->$dirs, rows $lake->$afterFold ok=${dirs == 2 && afterFold == lake}")
    }
    time("q71_lake_compaction (400-file partition)") {
      val lakePath = s"$outDir/frag_lake"
      fs.delete(new org.apache.hadoop.fs.Path(lakePath), true)
      // the streaming-trigger pathology: one date partition fragmented into
      // 400 tiny files (the reference's 50-record flushes at day scale)
      docs.select(F.col("doc_id"), F.col("text"), F.lit("2024-01-15").as("dt"))
        .repartition(400)
        .write.partitionBy("dt").parquet(lakePath)
      def partFiles() = {
        val st = fs.listStatus(new org.apache.hadoop.fs.Path(s"$lakePath/dt=2024-01-15"))
        st.count(s => s.getPath.getName.endsWith(".parquet"))
      }
      val before = spark.read.parquet(lakePath).count()
      val filesBefore = partFiles()
      sinks.Sinks.compactLakePartition(spark, lakePath, "dt", "2024-01-15",
        targetRecordsPerFile = 10000L)
      val after = spark.read.parquet(lakePath).count()
      val filesAfter = partFiles()
      val want = ((before + 9999) / 10000).toInt
      println(s"GRAFT_STRESS   rows $before->$after files $filesBefore->$filesAfter " +
        s"(target $want) ok=${before == after && filesAfter == want}")
    }
    time("q70_ivf_append (10x vectors: train on 90%, append 10%, serve parity)") {
      val idxPath = s"$outDir/ivf10x"
      fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)
      val base = embs.filter(F.pmod(F.col("vec_id"), F.lit(10)) =!= 7)
      val batch = embs.filter(F.pmod(F.col("vec_id"), F.lit(10)) === 7)
      val cents = functions.Similarity.kmeansCentroids(base, k = 16, iters = 2)
      functions.Similarity.writeIvfIndex(base, cents, idxPath)
      val t0 = System.nanoTime()
      functions.Similarity.appendToIvfIndex(spark, idxPath, batch)
      println(f"GRAFT_STRESS   append of ${batch.count()} vectors: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val queries = embs.filter(F.col("vec_id") < 100)
      val served = functions.Similarity
        .queryIvfIndex(spark, idxPath, queries, nProbe = 3, k = 10)
        .select("query_id", "rank", "neighbor_id", "sim")
      val rebuilt = functions.Similarity
        .ivfInt8TopK(embs, queries,
          functions.Similarity.readIvfCentroids(spark, idxPath), nProbe = 3, k = 10)
        .select("query_id", "rank", "neighbor_id", "sim")
      val diff = served.exceptAll(rebuilt).count() + rebuilt.exceptAll(served).count()
      println(s"GRAFT_STRESS   serve-after-append vs in-memory full corpus: " +
        s"${served.count()} rows, symmetric diff $diff, identical=${diff == 0L}")
    }
    // ---- round-11 family: product quantization at 10× — training cost
    // must stay model-bounded (one action/iter, k·D-cell collects), the
    // codes-only ADC scan must beat re-ranking economics (shortlist ≪
    // corpus), and the persisted IVF-PQ serve must agree with the
    // in-memory pipeline's ADC ordering under the same models.
    time("q90_pq (10x vectors: train, encode, ADC+re-rank, recall)") {
      val init = functions.Pq.initCodebooks(embs, dims = 64, m = 16, k = 16)
      val t0 = System.nanoTime()
      val model = functions.Pq.train(embs, init, iters = 3)
      println(f"GRAFT_STRESS   trained 16x16 codebooks over ${nv} vectors: " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      val queries = embs.filter(F.col("vec_id") < 20)
      val t1 = System.nanoTime()
      val approx = functions.Pq.pqTopK(embs, queries, model, k = 10, refine = 100)
      val nRes = approx.count()
      println(f"GRAFT_STRESS   ADC search + re-rank (20 queries x $nv codes): " +
        f"${(System.nanoTime() - t1) / 1e9}%.1f s, $nRes rows")
      val exact = functions.Similarity.bruteForceTopK(embs, queries, 10)
        .select("query_id", "neighbor_id")
      val hits = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      println(f"GRAFT_STRESS   recall@10 vs float: $hits/$nRes = " +
        f"${100.0 * hits / nRes}%.1f%% ok=${hits * 10 >= nRes * 6}")
    }
    time("q92_ivf_pq (10x vectors: persisted IVF-PQ index serve parity)") {
      val idxPath = s"$outDir/ivfpq10x"
      fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)
      val cents = functions.Similarity.kmeansCentroids(embs, k = 16, iters = 2)
      val model = functions.Pq.train(
        embs, functions.Pq.initCodebooks(embs, dims = 64, m = 16, k = 16), iters = 3)
      val t0 = System.nanoTime()
      functions.Pq.writeIvfPqIndex(embs, cents, model, idxPath)
      println(f"GRAFT_STRESS   index build (lists+codebooks+cells): " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      val queries = embs.filter(F.col("vec_id") < 20)
      val t1 = System.nanoTime()
      val served = functions.Pq.queryIvfPqIndex(spark, idxPath, queries, nProbe = 3, k = 10)
      val nServed = served.count()
      println(f"GRAFT_STRESS   served (3 of 16 cells probed): " +
        f"${(System.nanoTime() - t1) / 1e9}%.1f s, $nServed rows " +
        s"ok=${nServed == 20L * 10}")
    }
    // ---- round-9 family: the persisted dedup indexes at 10× — the
    // steady-state ingest shape. The claim under test: once history lives
    // in an index, probing a micro-batch must cost O(batch), not
    // O(corpus), and must agree row-for-row with the text-rescanning form.
    // A 500-doc batch against the 10× corpus makes the asymmetry visible
    // in wall clock, not just in plan shape. ----
    locally {
      val fpIdx = s"$outDir/fp_index_stress"
      val bandIdx = s"$outDir/band_index_stress"
      fs.delete(new org.apache.hadoop.fs.Path(fpIdx), true)
      fs.delete(new org.apache.hadoop.fs.Path(bandIdx), true)
      time("fp index build (10x corpus, one-time)") {
        functions.Dedup.writeFingerprintIndex(docs, fpIdx)
      }
      time("band index build (10x corpus, one-time)") {
        functions.Dedup.writeBandIndex(docs, bandIdx, nHashes = 64, nBands = 8)
      }
      val nDocs10 = docs.agg(F.max("doc_id")).head.getLong(0) + 1
      // 500 genuinely-fresh docs (token sets disjoint from the corpus; the
      // probe excludes the batch's OWN ids from collisions, so their shared
      // scaffold tokens are invisible) + 250 exact replays + 250
      // near-replays (one token appended)
      val batch = docs.filter(F.col("doc_id") % 100 === 1).limit(500)
        .select((F.col("doc_id") + nDocs10).as("doc_id"),
          F.concat(F.lit("genuinely fresh stress document number "),
            F.col("doc_id")).as("text"))
        .unionByName(docs.filter(F.col("doc_id") % 200 === 2).limit(250)
          .select((F.col("doc_id") + 2 * nDocs10).as("doc_id"), F.col("text")))
        .unionByName(docs.filter(F.col("doc_id") % 200 === 4).limit(250)
          .select((F.col("doc_id") + 3 * nDocs10).as("doc_id"),
            F.concat(F.col("text"), F.lit(" zz")).as("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"GRAFT_STRESS   probe batch: ${batch.count()} docs vs $nd-doc corpus")
      val viaIndex = time("fp probe via index (O(batch))") {
        functions.Dedup.dedupAgainstFingerprintIndex(spark, fpIdx, batch).count()
      }
      val viaText = time("fp dedup via history text re-scan (O(corpus))") {
        functions.Dedup.dedupAgainstHistory(docs, batch).count()
      }
      println(s"GRAFT_STRESS   exact-dedup survivors index=$viaIndex text=$viaText " +
        s"equal=${viaIndex == viaText}")
      val nearKept = time("band probe via index (near-dup, O(batch))") {
        functions.Dedup.dedupAgainstBandIndex(spark, bandIdx, batch,
          nHashes = 64, nBands = 8, minEstJaccard = 0.85,
          maxBandCollisions = 1000).count()
      }
      // exact replays are caught by banding too (est 1.0), near-replays
      // through the 8×8 bands; fresh docs carry a unique marker token but
      // stay ≥96% similar to their originals — the replication's
      // adversarial point is that the INDEX must separate "same doc plus
      // one token" (drop) from "distinct near-boilerplate" (judge by est)
      println(s"GRAFT_STRESS   near-dup survivors: $nearKept of ${batch.count()}")

      // ---- round-10: the eval-set DECONTAMINATION index at the same 10×.
      // The claim under test: suite text is winnowed once at install,
      // per-batch gating costs only the batch's own winnowing pass, and
      // the gate agrees row-for-row with the no-index form that re-winnows
      // the suites every batch. 100 planted verbatim quotes of suite docs
      // must all be caught (each shares its source's full ≥8-token run).
      val evalIdx = s"$outDir/eval_index_stress"
      fs.delete(new org.apache.hadoop.fs.Path(evalIdx), true)
      val evalSuite = docs.filter(F.col("doc_id") % 50 === 7)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"GRAFT_STRESS   eval suite: ${evalSuite.count()} docs of $nd")
      time("eval index build (winnow the suites, one-time)") {
        functions.Dedup.writeEvalIndex(evalSuite, evalIdx)
      }
      // persisted + counted: limit-without-order is plan-nondeterministic,
      // so an unpersisted `quotes` could union one row set into evalBatch
      // and probe a DIFFERENT one below; and the denominator must be the
      // rows that actually exist, not an assumed 100 (review finding)
      val quotes = evalSuite
        .filter(F.size(F.split(F.col("text"), " ")) >= 8).limit(100)
        .select((F.col("doc_id") + 5 * nDocs10).as("doc_id"),
          F.concat(F.lit("as the benchmark says "), F.col("text")).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nQuotes = quotes.count()
      val evalBatch = batch.select("doc_id", "text").unionByName(quotes)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nEvalBatch = evalBatch.count()
      val viaEvalIdx = time("eval decontam probe via index (O(batch))") {
        functions.Dedup.dedupAgainstEvalIndex(spark, evalIdx, evalBatch).count()
      }
      val viaSuiteRewinnow = time("eval decontam via per-batch suite re-winnow (no index)") {
        val suiteFps = functions.Text
          .winnowFingerprints(evalSuite, "text", "doc_id").select("fp").distinct()
        val bFps = functions.Text.winnowFingerprints(evalBatch, "text", "doc_id")
        val contaminated = bFps.join(suiteFps, Seq("fp"), "left_semi")
          .select("doc_id").distinct()
        evalBatch.join(F.broadcast(contaminated), Seq("doc_id"), "left_anti").count()
      }
      val quotesCaught = nQuotes -
        functions.Dedup.dedupAgainstEvalIndex(spark, evalIdx, quotes).count()
      println(s"GRAFT_STRESS   decontam survivors index=$viaEvalIdx " +
        s"rewinnow=$viaSuiteRewinnow equal=${viaEvalIdx == viaSuiteRewinnow} " +
        s"of $nEvalBatch; planted quotes caught: $quotesCaught/$nQuotes")
      quotes.unpersist()
      evalBatch.unpersist()
      evalSuite.unpersist()
      batch.unpersist()
    }
    // ---- round-11 family: the FULL 4-gate ingest loop at 10× — exact (fp
    // index), eval decontamination, lexical near-dup (band index) and
    // semantic near-dup (served IVF index) all enabled in one loop, plus
    // the maintenance round (lake fold + index fold + IVF health gate).
    // Every batch carries PLANTED probes for three of the gates, each in
    // its own id range, so the terminal lake certifies per-gate behavior
    // mechanically: 16 verbatim eval quotes (decontam must drop all), 16
    // semantic duplicates — unique text, embedding copied from an indexed
    // vector (the vector gate must drop all) — and exact replays of the
    // previous batch's corpus slice (the fp/band pair must drop all).
    // The wall-clock claim is the r7/r9 one extended to four index
    // families: per-batch cost stays flat while history grows, because
    // every probe is O(batch) with directory pruning. ----
    time("4-gate ingest loop (10x corpus, 8 batches, all indexes live)") {
      val root = s"$outDir/ingest4gate"
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val paths = pipeline.IngestPipeline.IngestPaths(root)
      val nB = 8
      // offline installs: the eval blocklist (a 2% suite slice, winnowed
      // once) and the served IVF index (centroids trained on the full 10×
      // vector corpus — the loop appends accepted vectors, never retrains)
      val evalSuite = docs.filter(F.col("doc_id") % 50 === 9)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  eval index install (winnow 2% suite)") {
        functions.Dedup.writeEvalIndex(evalSuite, paths.evalIndex)
      }
      time("  IVF index install (train + quantize 10x vectors)") {
        val cents = functions.Similarity.kmeansCentroids(embs, k = 16, iters = 2)
        functions.Similarity.writeIvfIndex(embs, cents, paths.ivfIndex)
      }
      val quoteSrc = evalSuite
        .filter(F.size(F.split(F.col("text"), " ")) >= 8)
        .orderBy("doc_id").limit(16)
        .select(F.col("doc_id").as("src_id"), F.col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      quoteSrc.count()
      val F0 = 100000000L; val S0 = 200000000L; val Q0 = 300000000L; val R0 = 400000000L
      val nPlant = 16
      var prevSlice: Option[org.apache.spark.sql.DataFrame] = None
      val batchSecs = scala.collection.mutable.ArrayBuffer[Double]()
      for (i <- 0 until nB) {
        val own = docs.filter(F.pmod(F.col("doc_id"), F.lit(nB)) === i)
          .select("doc_id", "text")
        // planted rows, each with enough per-row unique tokens that the
        // probes test THEIR gate, not incidental scaffold similarity
        def plant(base: Long, tag: String) =
          spark.range(nPlant).select(
            (F.col("id") + base + i * 1000L).as("doc_id"),
            F.concat(F.lit(s"$tag planted probe row "), F.col("id") + i * 1000L,
              F.lit(" u"), F.col("id") + i * 1000L, F.lit(s"a$tag b"),
              F.col("id") + i * 1000L, F.lit("c marker tail")).as("text"))
        val fresh = plant(F0, "fresh")
        val sem = plant(S0, "semdup")
        val quotes = quoteSrc.select(
          (F.col("src_id") + Q0 + i * 1000L).as("doc_id"),
          F.concat(F.lit(s"benchmark quote b$i says "), F.col("text")).as("text"))
        val replays = prevSlice.map(p => p.filter(F.col("doc_id") % 20 === (i - 1))
            .select((F.col("doc_id") + R0 + i * 1000000L).as("doc_id"), F.col("text")))
          .getOrElse(spark.emptyDataFrame.selectExpr("CAST(0 AS LONG) doc_id", "'' text").limit(0))
        val batch = own.unionByName(fresh).unionByName(sem)
          .unionByName(quotes).unionByName(replays)
        // embeddings: sem rows copy an indexed vector verbatim (cosine 1.0
        // → the vector gate must fire); fresh rows carry the NEGATED vector
        // (cosine −1 vs its source, |cos| ≤ ~0.5 vs the rest → must pass).
        // Source vectors are (i·nPlant + id): globally DISTINCT BASE vectors
        // across all batches — the 10× corpus replicates embeddings exactly
        // (vec_id ≡ base mod nVecs), so any residue collision hands two
        // batches the SAME vector and the second batch's "novel" plant is a
        // true semantic duplicate of the first's (the first smoke run's
        // fresh-kept 16/128).
        val vecPick = F.pmod(F.col("doc_id"), F.lit(1000L)) + F.lit(i.toLong * nPlant)
        val embSrc = embs.select(F.col("vec_id").as("__src"), F.col("embedding"))
        val semEmb = sem.select(F.col("doc_id").as("vec_id"), vecPick.as("__src"))
          .join(embSrc, "__src").select("vec_id", "embedding")
        val freshEmb = fresh.select(F.col("doc_id").as("vec_id"), vecPick.as("__src"))
          .join(embSrc, "__src")
          .select(F.col("vec_id"),
            F.transform(F.col("embedding"), x => -x).as("embedding"))
        val t0 = System.nanoTime()
        val n = pipeline.IngestPipeline.ingestBatch(
          spark, paths, batch, i.toLong,
          embedBatch = Some(semEmb.unionByName(freshEmb)),
          nearDup = Some(pipeline.IngestPipeline.NearDupConfig()),
          semanticDedup = Some(pipeline.IngestPipeline.SemanticDedupConfig(nProbe = 2, minSim = 0.95)),
          decontam = Some(pipeline.IngestPipeline.DecontamConfig()))
        val secs = (System.nanoTime() - t0) / 1e9
        batchSecs += secs
        println(f"GRAFT_STRESS   batch $i: accepted $n in $secs%.1f s")
        prevSlice = Some(own)
      }
      // terminal lake: every planted id range must be absent except the
      // fresh range, which must be fully present
      val lake = spark.read.parquet(paths.docLake)
        .select("doc_id").persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nLake = lake.count()
      def inRange(lo: Long) =
        lake.filter(F.col("doc_id") >= lo && F.col("doc_id") < lo + 100000000L).count()
      val (nF, nS, nQ, nR) = (inRange(F0), inRange(S0), inRange(Q0), inRange(R0))
      val wantFresh = nPlant.toLong * nB
      println(s"GRAFT_STRESS   lake=$nLake docs; fresh kept $nF/$wantFresh, " +
        s"semdup leaked $nS, quotes leaked $nQ, replays leaked $nR " +
        s"ok=${nF == wantFresh && nS == 0 && nQ == 0 && nR == 0}")
      val flat = batchSecs.drop(1)
      println(f"GRAFT_STRESS   per-batch wall: first ${batchSecs.head}%.1f s, " +
        f"rest min ${flat.min}%.1f max ${flat.max}%.1f s (flat = probes are O(batch))")
      lake.unpersist()
      time("  maintenance round (lake fold + index fold + IVF health)") {
        val report = pipeline.IngestPipeline.maintain(spark, paths,
          Some(pipeline.IngestPipeline.IvfHealthConfig(nProbe = 2)))
        val lakeDirs = fs.listStatus(new org.apache.hadoop.fs.Path(paths.docLake))
          .count(_.getPath.getName.startsWith("__ver="))
        val afterFold = spark.read.parquet(paths.docLake).count()
        println(s"GRAFT_STRESS   health=$report lakePartitions=$lakeDirs rows=$afterFold " +
          s"ok=${lakeDirs == 1 && afterFold == nLake}")
      }
      quoteSrc.unpersist()
      evalSuite.unpersist()
    }
    // ---- round-11 family: the span-scrub ingest loop (5th index family).
    // NOT run against the 10× replicated corpus on purpose: exact
    // replication makes EVERY span hot (each occurs ≥ copies times), so the
    // scrub would legitimately empty every document — a pathological-corpus
    // behavior, not a soak. The loop instead ingests unique synthetic docs
    // with two planted families around one boilerplate span:
    //   B-range: boiler prefix + unique tail — must ALL land; batches after
    //            the first hot-list refresh must land SCRUBBED, earlier ones
    //            verbatim (the freshness/stability trade, observed
    //            mechanically);
    //   E-range: all-boiler docs (per-batch distinct repetition) — land
    //            pre-refresh, quality-reject post-refresh (scrub empties
    //            them first).
    // Maintenance (lake+index fold + hot refresh) runs mid-loop, so the
    // soak crosses the refresh boundary and folds count generations while
    // the loop keeps ingesting. ----
    time("span-scrub ingest loop (6 batches, planted boilerplate)") {
      val root = s"$outDir/ingestspan"
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val paths = pipeline.IngestPipeline.IngestPaths(root)
      val scrub = Some(pipeline.IngestPipeline.SpanScrubConfig())
      val boiler = "boiler span alpha omega"
      val nB = 6; val perBatch = 5000L; val nPlant = 16
      val B0 = 500000000L; val E0 = 600000000L
      val secs = scala.collection.mutable.ArrayBuffer[Double]()
      for (i <- 0 until nB) {
        val filler = spark.range(perBatch).select(
          (F.col("id") + i * perBatch).as("doc_id"),
          F.concat(F.lit(s"d${i}f"), F.col("id"),
            F.lit(s" g${i}f"), F.col("id"), F.lit(s" h${i}f"), F.col("id"),
            F.lit(s" j${i}f"), F.col("id"), F.lit(s" k${i}f"), F.col("id"),
            F.lit(s" m${i}f"), F.col("id"), F.lit(s" n${i}f"), F.col("id"),
            F.lit(s" p${i}f"), F.col("id")).as("text"))
        val boilered = spark.range(nPlant).select(
          (F.col("id") + B0 + i * 1000L).as("doc_id"),
          F.concat(F.lit(s"$boiler u${i}x"), F.col("id"), F.lit(s" v${i}x"),
            F.col("id"), F.lit(s" w${i}x"), F.col("id"), F.lit(s" y${i}x"),
            F.col("id"), F.lit(s" z${i}x"), F.col("id")).as("text"))
        val allBoiler = spark.range(1).select(
          (F.col("id") + E0 + i).as("doc_id"),
          F.lit(Seq.fill(i + 2)(boiler).mkString(" ")).as("text"))
        val batch = filler.unionByName(boilered).unionByName(allBoiler)
        val t0 = System.nanoTime()
        val n = pipeline.IngestPipeline.ingestBatch(
          spark, paths, batch, i.toLong, spanScrub = scrub)
        secs += (System.nanoTime() - t0) / 1e9
        println(f"GRAFT_STRESS   batch $i: accepted $n in ${secs.last}%.1f s")
        // maintenance mid-loop: the refresh after batch 1 is what arms the
        // scrub for batches 2+ (boiler count is 18 ≥ 3 by then)
        if (i == 1 || i == 3) pipeline.IngestPipeline.maintain(spark, paths)
      }
      pipeline.IngestPipeline.maintain(spark, paths)
      val nHot = functions.Dedup.readHotSpanList(spark, paths.spanIndex).count()
      val lake = spark.read.parquet(paths.docLake)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bRows = lake.filter(F.col("doc_id") >= B0 && F.col("doc_id") < E0)
        .select(F.col("doc_id"), F.col("text").startsWith(boiler).as("hasBoiler"))
        .collect()
      val bPre = bRows.count(r => r.getLong(0) < B0 + 2000L && r.getBoolean(1))
      val bPost = bRows.count(r => r.getLong(0) >= B0 + 2000L && !r.getBoolean(1))
      val eKept = lake.filter(F.col("doc_id") >= E0 && F.col("doc_id") < E0 + 100L).count()
      val gens = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"${paths.spanIndex}/counts"))
        .count(_.getPath.getName.startsWith("batch="))
      println(s"GRAFT_STRESS   hotSpans=$nHot (want 1); boilered landed ${bRows.length}/" +
        s"${nPlant * nB} — pre-refresh verbatim $bPre/${nPlant * 2}, post-refresh scrubbed " +
        s"$bPost/${nPlant * (nB - 2)}; all-boiler kept $eKept (want 2, batches 0-1 only); " +
        s"count generations after fold: $gens (want 1) " +
        s"ok=${nHot == 1 && bRows.length == nPlant * nB && bPre == nPlant * 2 &&
          bPost == nPlant * (nB - 2) && eKept == 2 && gens == 1}")
      val flat = secs.drop(1)
      println(f"GRAFT_STRESS   per-batch wall: first ${secs.head}%.1f s, " +
        f"rest min ${flat.min}%.1f max ${flat.max}%.1f s")
      lake.unpersist()
    }
    // ---- round-12 family: MODEL-gate ingest loop at 10× — classifier
    // (hashed-linear) and perplexity (bigram LM) gates live together, each
    // with planted probes in its own id range. The classifier's poisoned
    // weight is −1 against a +1 background, so score_e4 = (1 − 2·ratio)·10⁴
    // where ratio = poisoned-feature fraction: the plant saturates its
    // features with the marker token (ratio ≈ 0.74 → ≈ −4800), while a
    // corpus doc that accidentally hash-collides moves by its collision
    // RATIO only — ~1/n per colliding occurrence, nowhere near the
    // −2000 threshold (ratio 0.6). The first smoke run used a −10⁶ poison
    // weight, where ONE collision anywhere rejected the doc — 6% of the
    // corpus — because e4 scoring amplifies the raw mean 10⁴×; magnitude
    // discrimination is the wrong axis under mean scoring, ratio is the
    // right one. Perplexity probes alternate the model's most frequent
    // prefix with unknowns (the maximal-cost miss); the threshold is the
    // midpoint of measured corpus-max and probe-min, and the SEPARATION
    // is itself an asserted flag. ----
    time("model-gate ingest loop (classifier + perplexity, planted probes)") {
      val root = s"$outDir/ingestmodelgate"
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val paths = pipeline.IngestPipeline.IngestPaths(root)
      val clean = pipeline.IngestPipeline.qualityFilter(docs).select("doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  LM install (train bigram model on 10x corpus)") {
        functions.LangModel.train(clean, "text", paths.lmModel)
      }
      val dim = functions.QualityClassifier.DefaultDim
      val w = Array.fill(dim)(1L)
      w(functions.QualityClassifier.featureBucket("qpoison", dim)) = -1L
      w(functions.QualityClassifier.featureBucket("qpoison qpoison", dim)) = -1L
      functions.QualityClassifier.writeModel(spark,
        functions.QualityClassifier.Model(w, 0L), paths.qualityModel)
      val qModel = functions.QualityClassifier.readModel(spark, paths.qualityModel)
      val gate = pipeline.IngestPipeline.QualityGateConfig(qModel, minScoreE4 = -2000L)
      // measured separation: corpus max vs gibberish min mean log-prob.
      // Probe design: ALL-unknown gibberish scores exactly the smoothing
      // FLOOR log2(V) per transition — the cheapest miss there is, below
      // many real docs (the first smoke run measured the inversion). The
      // expensive miss is a KNOWN, maximally-frequent prefix with an
      // unseen continuation: log2(c1max + V), which upper-bounds every
      // in-corpus transition of that prefix by ≥1 bit. So the probe
      // alternates the model's own most-frequent token (argmax of the
      // persisted miss table — no second corpus pass) with unknowns.
      val maxOwn = functions.LangModel.scoreDocs(clean, "text", "doc_id", paths.lmModel)
        .agg(F.max("ppl_e4")).head().getLong(0)
      val commonTok = spark.read.parquet(s"${paths.lmModel}/unigrams")
        .filter(F.length(F.col("w1")) > 0) // an empty token would mangle the probe text
        .orderBy(F.col("miss_lp_e4").desc, F.col("w1")).head().getString(0)
      val QP0 = 700000000L; val GB0 = 800000000L
      val nB = 4; val nPlant = 16
      def gibberish(i: Int) = spark.range(nPlant).select(
        (F.col("id") + GB0 + i * 1000L).as("doc_id"),
        F.concat(F.lit(s"zq${i}h"), F.col("id"), F.lit(" "),
          F.lit(Seq("zzqa", "zzqb", "zzqc", "zzqd", "zzqe", "zzqf")
            .map(z => s"$commonTok $z").mkString(" "))).as("text"))
      val minGib = functions.LangModel.scoreDocs(gibberish(0), "text", "doc_id", paths.lmModel)
        .agg(F.min("ppl_e4")).head().getLong(0)
      val sep = maxOwn < minGib
      val pplMax = (maxOwn + minGib) / 2
      println(s"GRAFT_STRESS   ppl separation: corpusMax=$maxOwn gibberishMin=$minGib " +
        s"threshold=$pplMax ok=$sep")
      val ppl = pipeline.IngestPipeline.PerplexityGateConfig(paths.lmModel, pplMax)
      var funnels = List.empty[pipeline.IngestPipeline.FunnelReport]
      val secs = scala.collection.mutable.ArrayBuffer[Double]()
      for (i <- 0 until nB) {
        val own = clean.filter(F.pmod(F.col("doc_id"), F.lit(nB)) === i)
        val poisoned = spark.range(nPlant).select(
          (F.col("id") + QP0 + i * 1000L).as("doc_id"),
          F.concat(F.lit(Seq.fill(12)("qpoison").mkString(" ")),
            F.lit(" filler"), F.col("id"),
            F.lit(s" ra${i}t"), F.col("id"), F.lit(s" rb${i}t"), F.col("id"),
            F.lit(s" rc${i}t"), F.col("id")).as("text"))
        val batch = own.unionByName(poisoned).unionByName(gibberish(i))
        val t0 = System.nanoTime()
        val n = pipeline.IngestPipeline.ingestBatch(
          spark, paths, batch, i.toLong,
          qualityGate = Some(gate), perplexityGate = Some(ppl),
          funnelSink = Some(r => funnels = r :: funnels))
        secs += (System.nanoTime() - t0) / 1e9
        println(f"GRAFT_STRESS   batch $i: accepted $n in ${secs.last}%.1f s " +
          s"funnel=${funnels.headOption.getOrElse("")}")
      }
      val lake = spark.read.parquet(paths.docLake).select("doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def inRange(lo: Long) =
        lake.filter(F.col("doc_id") >= lo && F.col("doc_id") < lo + 100000000L).count()
      val (nQP, nGB) = (inRange(QP0), inRange(GB0))
      val expected = clean.select("text").distinct().count()
      val nOwn = lake.count() - nQP - nGB
      // funnel telescoping held on every batch, and the two model stages
      // each dropped exactly their plants
      val fOk = funnels.forall(f =>
        f.afterQuality >= f.afterClassifier &&
          f.afterClassifier - f.afterPerplexity == nPlant &&
          f.afterQuality - f.afterClassifier == nPlant)
      println(s"GRAFT_STRESS   poisoned landed=$nQP (want 0), gibberish landed=$nGB (want 0), " +
        s"own=$nOwn expectedUnique=$expected funnelOk=$fOk " +
        s"ok=${nQP == 0 && nGB == 0 && nOwn == expected && fOk && sep}")
      lake.unpersist(); clean.unpersist()
    }
    // ---- round-17 family: the RETRIEVAL-decontam ingest loop — the q124
    // stage driven through the public entry the way the lang/quality/
    // perplexity gates are (r16 verdict gap). The eval suite is drawn from
    // held-out BASE docs (replica-closed: no replica of an eval base
    // enters the stream, so the stream's organic contamination is the
    // corpus's own near-dup structure, adjudicated by the OPERATOR run
    // offline — the soak asserts gate == operator, plants aside). The
    // threshold comes from the in-engine calibration (q127) against a
    // clean sample and injected light-edit leaks — the production recipe
    // end to end, not a hand-picked constant. ----
    time("retrieval-decontam ingest loop (6 batches, calibrated threshold)") {
      val root = s"$outDir/ingestretrieval"
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val paths = pipeline.IngestPipeline.IngestPaths(root)
      val idx = s"$root/eval_bm25"
      val nBase = spark.read.parquet(s"$srcDir/documents.parquet")
        .agg(F.max("doc_id")).head.getLong(0) + 1
      val baseOf = F.pmod(F.col("doc_id"), F.lit(nBase))
      val evalSuite = docs
        .filter(F.col("doc_id") < nBase && baseOf % 50 === 21)
        .filter(F.size(F.split(F.col("text"), " ")) >= 8)
        .dropDuplicates("text") // distinct texts -> leak plants are intra-distinct
        .select("doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val stream = docs.filter(baseOf % 50 =!= 21).select("doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("  eval shingle index install (bigram BM25)") {
        functions.Bm25.buildIndex(evalSuite, "text", "doc_id", idx, ngram = 2)
      }
      // calibrate on a KNOWN-clean stream sample + injected light-edit
      // leaks (prefix/suffix edits keep most interior bigrams matching).
      // "Known clean" is ground truth a curator has and a soak must
      // construct: the corpus's organic near-dup structure can plant a
      // true cross-base near-copy of an eval doc inside a random sample,
      // so the sample excludes docs the report flags at the DEFAULT
      // threshold — calibration then refines from there (the recipe the
      // operator's doc prescribes)
      val rawSample = stream.filter(F.col("doc_id") % 97 === 5)
      val cleanSample = rawSample.join(
        functions.Bm25.contaminationReport(rawSample, "text", "doc_id", idx)
          .filter(F.col("contaminated") === 1L).select("doc_id"),
        Seq("doc_id"), "left_anti")
      val leakedSample = evalSuite.orderBy("doc_id").limit(64)
        .select(F.col("doc_id"),
          F.concat(F.lit("quoted for review e"), F.col("doc_id"),
            F.lit(" : "), F.col("text"), F.lit(" (cited)")).as("text"))
      val cal = time("  threshold calibration (one unioned sweep)") {
        functions.Bm25.calibrateContaminationThreshold(
          cleanSample, leakedSample, "text", "doc_id", idx).head()
      }
      val sep = cal.getLong(cal.fieldIndex("separated")) == 1L
      val thr = cal.getLong(cal.fieldIndex("suggested_e6"))
      println(s"GRAFT_STRESS   calibration: cleanMax=${cal.get(cal.fieldIndex("clean_max_e6"))} " +
        s"leakedMin=${cal.get(cal.fieldIndex("leaked_min_e6"))} threshold=$thr ok=$sep")
      // the operator's own offline adjudication of the stream: which docs
      // WOULD the stage drop — the gate must agree exactly
      val flagged = functions.Bm25
        .contaminationReport(stream, "text", "doc_id", idx, thr)
        .filter(F.col("contaminated") === 1L).select("doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nFlagged = flagged.count()
      // strict default: a mistyped index path must FAIL the batch loudly
      val strictOk =
        try {
          pipeline.IngestPipeline.ingestBatch(
            spark, pipeline.IngestPipeline.IngestPaths(s"$root/strictprobe"),
            spark.range(1).select(F.col("id").as("doc_id"),
              F.lit("strict probe doc text").as("text")),
            0L,
            retrievalDecontam = Some(
              pipeline.IngestPipeline.RetrievalDecontamConfig(s"$root/no_such_index")))
          false
        } catch { case _: IllegalStateException => true }
      val cfg = pipeline.IngestPipeline.RetrievalDecontamConfig(idx, thresholdE6 = thr)
      val L0 = 900000000L; val C0 = 1000000000L
      val nB = 6; val nPlant = 16
      val evalRanked = evalSuite.withColumn("__rk",
        F.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("doc_id")))
      var funnels = List.empty[pipeline.IngestPipeline.FunnelReport]
      val leakCounts = scala.collection.mutable.ArrayBuffer[Long]()
      val secs = scala.collection.mutable.ArrayBuffer[Double]()
      for (i <- 0 until nB) {
        val own = stream.filter(F.pmod(F.col("doc_id"), F.lit(nB)) === i)
        // leak plants: light edits of eval docs (rotating slice per batch,
        // by DENSE RANK — eval doc ids are 50k+21, whose residues mod 6
        // cycle {3,5,1}, so an id-modulus slice leaves even batches with
        // zero plants) — near-verbatim bigram overlap, the exact layer
        // winnowing misses. The EDITED text pre-passes the unconditional
        // quality heuristics (the edit itself can flip a marginal doc's
        // bucket), so every counted plant reaches — and tests — the
        // RETRIEVAL stage, and the per-batch funnel drop is attributable.
        val leaks = pipeline.IngestPipeline.qualityFilter(
          evalRanked.filter(F.pmod(F.col("__rk"), F.lit(nB)) === i)
            .orderBy("doc_id").limit(nPlant)
            .select((F.col("doc_id") + L0 + i * 1000L).as("doc_id"),
              F.concat(F.lit(s"le$i edit "), F.col("text"),
                F.lit(s" tail$i")).as("text")))
        // clean plants: per-row unique tokens, no bigram shared with eval
        val cleanP = spark.range(nPlant).select(
          (F.col("id") + C0 + i * 1000L).as("doc_id"),
          F.concat(F.lit(s"cp${i}a"), F.col("id"), F.lit(s" cp${i}b"),
            F.col("id"), F.lit(s" cp${i}c"), F.col("id"), F.lit(s" cp${i}d"),
            F.col("id"), F.lit(s" cp${i}e"), F.col("id"), F.lit(s" cp${i}f"),
            F.col("id"), F.lit(s" cp${i}g"), F.col("id")).as("text"))
        val batch = own.unionByName(leaks).unionByName(cleanP)
        leakCounts += leaks.count() // actual plant count this batch
        val t0 = System.nanoTime()
        val n = pipeline.IngestPipeline.ingestBatch(
          spark, paths, batch, i.toLong, retrievalDecontam = Some(cfg),
          funnelSink = Some(r => funnels = r :: funnels))
        secs += (System.nanoTime() - t0) / 1e9
        println(f"GRAFT_STRESS   batch $i: accepted $n in ${secs.last}%.1f s " +
          s"funnel=${funnels.headOption.getOrElse("")}")
      }
      pipeline.IngestPipeline.maintain(spark, paths)
      val lake = spark.read.parquet(paths.docLake).select("doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def inRange(lo: Long) =
        lake.filter(F.col("doc_id") >= lo && F.col("doc_id") < lo + 100000000L).count()
      val (nL, nC) = (inRange(L0), inRange(C0))
      val leakedStream = lake.join(flagged, "doc_id").count()
      val nOwn = lake.count() - nL - nC
      // expected = distinct texts surviving the unconditional quality
      // heuristics, minus the texts the operator flags (the flag is a
      // function of text, so any per-text representative adjudicates)
      val keptStream = pipeline.IngestPipeline.qualityFilter(stream)
        .select("doc_id", "text")
      val expectedOwn = keptStream.select("text").distinct().count() -
        keptStream.dropDuplicates("text").join(flagged, "doc_id").count()
      // every batch's retrieval stage dropped at least its (non-empty)
      // leak-plant load — the per-batch funnel pins the drop to the stage
      val fOk = leakCounts.forall(_ > 0) &&
        funnels.reverse.zip(leakCounts).forall { case (f, n) =>
          f.afterDecontam - f.afterRetrievalDecontam >= n }
      println(s"GRAFT_STRESS   lake=${lake.count()}: leak plants landed=$nL (want 0), " +
        s"clean plants kept=$nC/${nPlant * nB}, flagged-stream leaked=$leakedStream (want 0), " +
        s"own=$nOwn expected=$expectedOwn strictFail=$strictOk funnelOk=$fOk " +
        s"ok=${nL == 0 && nC == nPlant * nB && leakedStream == 0 &&
          nOwn == expectedOwn && strictOk && fOk && sep}")
      val flat = secs.drop(1)
      println(f"GRAFT_STRESS   per-batch wall: first ${secs.head}%.1f s, " +
        f"rest min ${flat.min}%.1f max ${flat.max}%.1f s (eval index static, probes O(batch))")
      println(s"GRAFT_STRESS   organic near-dup structure adjudicated by the operator: " +
        s"$nFlagged/${stream.count()} stream docs flagged at threshold=$thr")
      lake.unpersist(); flagged.unpersist(); stream.unpersist(); evalSuite.unpersist()
    }
    time("salted skew join (hot-key events x wide user dim)") {
      // round-13 verdict #6: a plain user equi-join on the skewed key
      // (user 0 = ~18% of the 10x events) vs ops.SkewJoin.saltedJoin —
      // the dim is every user id (too many rows for a comfy broadcast at
      // real scale), results must be checksum-identical
      val ev = spark.read.parquet(s"$outDir/events_stress.parquet")
        .select("event_id", "user_id", "value")
      val maxUser = ev.agg(F.max("user_id")).head.getLong(0)
      val userDim = spark.range(maxUser + 1).select(
        F.col("id").as("user_id"), (F.col("id") % 97).as("cohort"))
      def sig(j: org.apache.spark.sql.DataFrame) = j.agg(
        F.count(F.lit(1)),
        F.bit_xor(F.xxhash64(F.col("event_id"), F.col("cohort")))).head()
      val plainJ = time("  plain equi-join (AQE defaults)") {
        sig(ev.join(userDim, Seq("user_id")))
      }
      val saltedJ = time("  saltedJoin salts=32 (same input)") {
        sig(ops.SkewJoin.saltedJoin(ev, userDim, "user_id",
          saltFrom = F.col("event_id"), salts = 32))
      }
      println(s"GRAFT_STRESS   skew-join checksums plain=$plainJ salted=$saltedJ " +
        s"equal=${plainJ == saltedJ} ok=${plainJ == saltedJ}")
    }
    time("warc stream-read (ONE container >> per-record window)") {
      // round-13 verdict #2 evidence: a single container far larger than
      // the parser's 64 KiB window (and, gzipped, far larger than its
      // compressed size) streams through one task record by record. One
      // shard on purpose — the stage is the per-task memory envelope,
      // not parallelism.
      val warcDir = s"$outDir/warc_big"
      fs.delete(new org.apache.hadoop.fs.Path(warcDir), true)
      // ~8 KiB padding per record × the full 10x corpus ≈ 0.4 GiB
      // decompressed through ONE task — the envelope check below needs
      // the container to actually dwarf both the 64 KiB window and the
      // 128 MiB yardstick (the old 1/3-slice ~1 KiB sizing quietly
      // shrank below it and self-reported ok=false)
      val pad = F.lit(" " + "pad " * 2048)
      val rows = docs.select(
        F.lit(0L).as("shard"),
        F.col("doc_id").as("sort_key"),
        F.concat(F.lit("urn:stress:"), F.col("doc_id")).as("record_id"),
        F.concat(F.lit("https://s/"), F.col("doc_id")).as("target_uri"),
        F.concat(F.col("text"), pad).as("body"),
        F.lit(0).as("len_delta"))
      sources.Warc.writeSharded(spark, rows, warcDir, shards = 1, gzip = true)
      val containerBytes = fs.getContentSummary(
        new org.apache.hadoop.fs.Path(warcDir)).getLength
      val back = sources.Warc.records(sources.Warc.read(spark, warcDir))
      val got = back.agg(
        F.count(F.lit(1)), F.bit_xor(F.xxhash64(F.col("record_id"), F.col("body"))),
        F.sum(F.col("content_length"))).head()
      val want = rows.agg(
        F.count(F.lit(1)), F.bit_xor(F.xxhash64(F.col("record_id"), F.col("body")))).head()
      val decompressed = got.getLong(2)
      val identical = got.get(0) == want.get(0) && got.get(1) == want.get(1)
      println(s"GRAFT_STRESS   container=${containerBytes / (1 << 20)} MiB compressed / " +
        s"${decompressed / (1 << 20)} MiB decompressed payload (one .warc.gz task), " +
        s"records=${got.get(0)} identical=$identical " +
        s"ok=${identical && decompressed > (128L << 20)}")
    }
    time("bm25 (10x corpus: build, serve, incremental parity)") {
      // round-14 family: the inverted index at 50k docs — one-shot build
      // vs install(evens)+append(odds)+refresh must serve checksum-equal
      // results (the q122 claim at 10×), and the serve cost is the probe
      // join, never a corpus re-scan
      val oneShot = s"$outDir/bm25_idx"
      val inc = s"$outDir/bm25_inc"
      fs.delete(new org.apache.hadoop.fs.Path(oneShot), true)
      fs.delete(new org.apache.hadoop.fs.Path(inc), true)
      time("  one-shot index build") {
        functions.Bm25.buildIndex(docs, "text", "doc_id", oneShot)
      }
      time("  incremental install+append+refresh (2 generations)") {
        functions.Bm25.installIndex(
          docs.filter(F.col("doc_id") % 2 === 0), "text", "doc_id", inc)
        functions.Bm25.appendDocs(docs.filter(F.col("doc_id") % 2 === 1), inc, 1L)
        functions.Bm25.refreshIndex(spark, inc)
      }
      val probes = functions.Bm25.pseudoQueries(docs, "text", "doc_id", 8, 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      probes.count()
      def serveSig(path: String) = functions.Bm25.search(spark, probes, path, 10)
        .agg(F.count(F.lit(1)), F.bit_xor(F.xxhash64(
          F.col("query_id"), F.col("rank"), F.col("doc_id"), F.col("score_e6")))).head()
      val a = time("  serve 8 probes top-10 (one-shot)") { serveSig(oneShot) }
      val b = time("  serve 8 probes top-10 (incremental)") {
        serveSig(functions.Bm25.indexRoot(inc))
      }
      probes.unpersist()
      println(s"GRAFT_STRESS   bm25 serve checksums oneshot=$a incremental=$b " +
        s"equal=${a == b} ok=${a == b && a.getLong(0) > 0}")
    }
    time("unigram (10x corpus: dictionary, EM train, encode)") {
      // round-14 family: training cost is the ONE dictionary aggregation
      // plus bounded driver EM — independent of corpus row count beyond
      // the aggregation — and the encode is a single codegen map stage
      val dict = time("  dictionary aggregation (capped 50k words)") {
        functions.Unigram.learnDictionary(docs, "text")
      }
      val model = time(s"  EM train (driver, ${dict.size} words)") {
        functions.Unigram.trainFromDictionary(dict)
      }
      val enc = time("  viterbi encode 10x docs (one map stage)") {
        docs.select(functions.Unigram.encodeStats(F.col("text"), model).as("u"))
          .agg(F.sum("u.n_tokens"), F.sum("u.n_unk"),
            F.bit_xor(F.xxhash64(F.col("u.tokens")))).head()
      }
      println(s"GRAFT_STRESS   unigram pieces=${model.pieces.length} " +
        s"tokens=${enc.get(0)} unk=${enc.get(1)} sig=${enc.get(2)} " +
        s"ok=${enc.getLong(0) > 0}")
    }
    time("langid serve at K=64 (single-pass vs K-pass)") {
      // round-14 verdict #4 evidence: real lang-id is K≈100+ classes —
      // the single-pass QualityMultiFeatureSum serve (one tokenize+md5
      // per feature, K modulo+lookups) must stay near-flat in K where
      // the historical K-pass shape (one featureSum expression per
      // class) re-hashes the corpus K times. Same scores by contract —
      // checksums must match exactly.
      import functions.QualityClassifier
      val models = (0 until 64).map { k =>
        // distinct per-class tables (and a few distinct dims, so the
        // per-class modulo path is exercised) from the shared formula
        val dim = 2048 + (k % 5)
        f"cls$k%02d" -> QualityClassifier.Model(
          QualityClassifier.synthesizeWeights(dim).map(_ + k), bias = k.toLong)
      }
      val sample = docs.filter(F.col("doc_id") % 5 === 0)
      def sig(d: org.apache.spark.sql.DataFrame) = d.agg(
        F.count(F.lit(1)),
        F.bit_xor(F.xxhash64(F.col("pred"), F.col("n_feats"),
          F.col("score_cls00_e4"), F.col("score_cls63_e4")))).head()
      val single = time("  single-pass (QualityMultiFeatureSum)") {
        sig(QualityClassifier.classifyMulti(sample, "text", models))
      }
      val kPass = time("  K-pass (one featureSum per class, historical shape)") {
        val sorted = models.sortBy(_._1)
        val withSums = sorted.foldLeft(sample) { case (d, (c, m)) =>
          d.withColumn(s"__q_$c", QualityClassifier.featureSum(F.col("text"), m))
        }
        val base = withSums.withColumn("n_feats",
          F.col(s"__q_${sorted.head._1}").getField("n_feats"))
        val scored = sorted.foldLeft(base) { case (d, (c, m)) =>
          d.withColumn(s"score_${c}_e4", functions.ExactAgg.divHalfUp(
            (F.col(s"__q_$c").getField("wsum") + m.bias) * 10000, F.col("n_feats")))
        }
        val best = sorted.map { case (c, _) => F.col(s"score_${c}_e4") }
          .reduceLeft((a, b) => F.greatest(a, b))
        val pred = sorted.init.foldRight(F.lit(sorted.last._1): org.apache.spark.sql.Column) {
          case ((c, _), acc) =>
            F.when(F.col(s"score_${c}_e4") === best, F.lit(c)).otherwise(acc)
        }
        sig(scored.withColumn("pred", pred))
      }
      println(s"GRAFT_STRESS   langid K=64 checksums single=$single kpass=$kPass " +
        s"equal=${single == kPass} ok=${single == kPass && single.getLong(0) > 0}")
    }
    val rt = Runtime.getRuntime
    println(s"GRAFT_STRESS driver heap used: ${(rt.totalMemory - rt.freeMemory) / (1 << 20)} MiB")
    spark.stop()
  }
}
