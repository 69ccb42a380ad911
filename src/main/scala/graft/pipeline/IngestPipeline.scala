package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.{Dedup, IndexProtocol, Kmv, PersistedIndex, Pq, Similarity, Text}
import graft.ops.Cleaning
import graft.sinks.Sinks

/** Incremental training-data ingest: the steady-state composition of the
  * amortized primitives — per micro-batch, quality-filter, dedup within the
  * batch, dedup against the persisted fingerprint index ([[Dedup]], q69's
  * operator), optionally NEAR-dup against the persisted band index
  * ([[Dedup.dedupAgainstBandIndex]], q78's operator — see [[NearDupConfig]])
  * and SEMANTIC-dup against the served IVF index
  * ([[Similarity.dedupAgainstIvfIndex]], q81's operator — see
  * [[SemanticDedupConfig]]),
  * land the accepted docs in the versioned lake, append their fingerprints
  * (and band generations) to the indexes, and (when the batch carries
  * embeddings and a served IVF index exists) grow the index with
  * [[Similarity.appendToIvfIndex]] (q70's operator) — plus, when an
  * IVF-PQ serving index is installed, keep its 16-byte codes fresh with
  * [[Pq.appendToIvfPqIndex]] (q92's family). This is the loop a
  * 100 TB corpus actually runs: every per-cycle cost is O(batch) — the
  * history is touched only through its 16-byte/doc fingerprint index, its
  * ~(nBands+signature)-bytes/doc band index, and its centroid model, never
  * its text or its resident vectors.
  *
  * Exactly-once across crash/replay, by construction rather than by lock:
  *   - the whole transaction is gated on a last-applied-batch manifest
  *     (foreachBatch delivers serially, so a single high-water mark
  *     suffices); a replay of an already-recorded batch is a no-op;
  *   - within the crash window (some writes done, manifest not yet
  *     recorded) each write is individually replay-safe: the doc lake is
  *     [[Sinks.appendVersioned]] (`__ver=batchId` dynamic partition
  *     overwrite — the replay overwrites only its own partition), fingerprint
  *     appends are membership state (duplicate fps cannot change a semi-join
  *     probe), and IVF list appends are absorbed at serve time
  *     ([[Similarity.queryIvfIndex]] deduplicates identical scored rows, so
  *     an at-least-once append serves exactly-once results);
  *   - write ORDER makes the recovery total: the fingerprint append is the
  *     batch's dedup commit point (after it a replay recomputes an empty
  *     accepted set), so it runs LAST among the data writes — see
  *     [[ingestBatch]]'s in-line crash enumeration.
  * The manifest write itself is temp+rename, so it is never observed
  * half-written.
  *
  * Reference behavior being composed: the ingest loop the reference runs as
  * separate jobs (stream archiver `kafka_to_minio.py`, batch dedup/clean
  * `spark_batch_v2.py`) — re-expressed as one crash-safe Spark transaction.
  */
object IngestPipeline {

  /** Directory layout of one ingest root. All state the loop owns lives
    * under a single root so a fixture stamp over the root governs the whole
    * composition.
    */
  final case class IngestPaths(root: String) {
    val docLake: String = s"$root/doc_lake"
    val embLake: String = s"$root/emb_lake"
    val fpIndex: String = s"$root/fp_index"
    val ivfIndex: String = s"$root/ivf_index"
    val ivfPqIndex: String = s"$root/ivf_pq_index"
    val bandIndex: String = s"$root/band_index"
    val evalIndex: String = s"$root/eval_index"
    val spanIndex: String = s"$root/span_index"
    // model artifacts the opt-in gates read (installed offline, like the
    // eval index: QualityClassifier.writeModel / LangModel.train)
    val qualityModel: String = s"$root/quality_model"
    val lmModel: String = s"$root/lm_model"
    val cardSketch: String = s"$root/card_sketch"
    val manifest: String = s"$root/_ingest_applied"
  }

  /** Opt-in NEAR-dup stage for [[ingestBatch]]: hyperparameters of the
    * persisted band index ([[Dedup.writeBandIndex]] — part of the index's
    * identity, so changing them requires a fresh index) plus the
    * acceptance gate. The defaults mirror q78: 8 × 8 banding (~0.77 LSH
    * threshold) with est ≥ 0.85 verification, and a hot-band cap — the
    * exact stage runs first and owns identical content, so capped bands
    * only ever skip near-misses of degenerate boilerplate clusters.
    */
  final case class NearDupConfig(
      nHashes: Int = 64,
      nBands: Int = 8,
      minEstJaccard: Double = 0.85,
      seed: Long = 42L,
      maxBandCollisions: Int = 1000,
      // directory-count modulus for the band index built at bootstrap; None
      // sizes it from the FIRST batch, so a production install expecting the
      // corpus to grow far beyond it should set this explicitly (the modulus
      // is part of the index install, like IVF's k)
      bpMod: Option[Int] = None)

  /** Opt-in SEMANTIC near-dup stage for [[ingestBatch]] (round 10): drop
    * batch docs whose embedding scores int8-cosine ≥ `minSim` against any
    * resident of the served IVF index's probed cells
    * ([[Similarity.dedupAgainstIvfIndex]], q81's operator). Runs after the
    * text stages (exact owns identical content, band owns lexical
    * near-misses — this stage only ever pays for paraphrase-grade
    * duplicates) and only when the batch carries embeddings AND an IVF
    * index is installed; docs without an embedding row pass through
    * unprobed. The default threshold is deliberately high: at 0.98 the
    * stage removes re-encodings of the same content, not topically-similar
    * documents — curation-grade similarity filtering belongs in
    * [[graft.ops.Sampling]], not in the ingest acceptance gate.
    *
    * Replay-safe like the other probes: a crash window may have already
    * appended the batch's own vectors to the index, but the probe excludes
    * self-ids, so acceptance recomputes identically on every replay.
    */
  final case class SemanticDedupConfig(
      nProbe: Int = 4,
      minSim: Double = 0.98)

  /** Opt-in eval-set DECONTAMINATION stage for [[ingestBatch]]: drop batch
    * docs sharing ≥ `minSharedFps` winnowing fingerprints (each a verbatim
    * run of ≥ w+k−1 tokens) with the eval suites indexed under
    * [[IngestPaths.evalIndex]], counted against the suites' fingerprint
    * UNION ([[Dedup.dedupAgainstEvalIndex]], q82's operator). The index is installed/appended offline per benchmark
    * suite ([[Dedup.writeEvalIndex]] / [[Dedup.appendEvalIndex]] — its
    * winnowing geometry travels in its own layout file); ingest only ever
    * probes. Unlike every dedup stage, the blocklist does NOT grow with the
    * stream, so replay-invariance is trivial. Runs right after the exact
    * stage: the gate is a correctness property of the TRAINING SET (leaked
    * eval docs poison every benchmark number downstream), so it precedes
    * the approximate near-dup stages, and exact-first means winnowing sees
    * each content once.
    */
  final case class DecontamConfig(minSharedFps: Int = 1)

  /** Opt-in RETRIEVAL decontamination stage for [[ingestBatch]] — the
    * near-verbatim/paraphrase layer the winnowing blocklist cannot see
    * (q124's operator, [[graft.functions.Bm25.contaminationReport]]):
    * batch docs whose per-shingle-normalized top-1 BM25 score against the
    * eval-suite shingle index at `indexPath` reaches `thresholdE6` are
    * dropped. The index is built offline per benchmark release
    * ([[graft.functions.Bm25.buildIndex]] with ngram ≥ 2); like the
    * winnowing blocklist it never grows with the stream, so
    * replay-invariance is trivial. Runs right after the winnowing gate:
    * same correctness rationale (eval leakage poisons every downstream
    * benchmark), one layer deeper.
    *
    * `strict` (default): an unreadable index at `indexPath` FAILS the
    * batch. Unlike the winnowing gate (whose index lives at the loop's
    * own well-known [[IngestPaths.evalIndex]]), this config carries a
    * user-supplied path — a permanent typo would otherwise ingest every
    * batch unscreened forever behind a WARN nobody reads (r15 advice).
    * `strict = false` opts back into warn-and-continue for the
    * bootstrap-before-install window.
    */
  final case class RetrievalDecontamConfig(
      indexPath: String,
      thresholdE6: Long = graft.functions.Bm25.ContaminationThresholdE6,
      strict: Boolean = true)

  /** Opt-in incremental HOT-SPAN SCRUB stage for [[ingestBatch]] — the
    * steady-state face of [[Text.hotSpanScrub]] (q84), driven by the
    * persisted span-count index ([[Dedup.writeSpanCountIndex]]): each
    * batch's text is rewritten against the index's current hot list (spans
    * occurring ≥ minCount times across everything landed so far), then its
    * own span counts publish as an immutable generation. The hot list
    * itself refreshes only on the MAINTENANCE cadence ([[maintain]] →
    * [[Dedup.refreshHotSpanList]]) — deliberately: a list that moved
    * per-batch would make a crash-replay scrub differently than its first
    * attempt, and the acceptance gates downstream of the rewrite would
    * recompute a different accepted set. Between refreshes a newly-hot
    * span sails through, which is the standard freshness/stability trade
    * every blocklist-style gate here makes.
    *
    * Unlike the dedup gates this stage REWRITES rows rather than dropping
    * them, so it runs FIRST — before the quality filter (a doc that is all
    * boilerplate should fail the length gate post-scrub) and before every
    * fingerprint computation (dedup must see the text that will land).
    * (k, minCount) are part of the index identity and travel in its
    * layout; the config's values apply at bootstrap install only.
    *
    * Composition caveat (inherent to any rewrite ahead of exact dedup):
    * content RE-PRESENTED across a hot-list refresh boundary scrubs
    * differently than its landed form did, so its post-scrub fingerprint
    * no longer matches the index — the exact gate catches same-era
    * replays only; cross-era re-presentations fall through to the
    * near-dup gate (which sees them: the texts differ by exactly the
    * newly-hot spans). Deployments replaying old feeds through a long-
    * lived loop should enable [[NearDupConfig]] alongside the scrub.
    */
  final case class SpanScrubConfig(
      k: Int = 4,
      minCount: Long = 3L,
      maxBroadcastHot: Long = 1L << 20)

  /** Opt-in model-based quality gate ([[graft.functions.QualityClassifier]]):
    * docs scoring below `minScoreE4` are rejected alongside the heuristic
    * [[qualityFilter]]. The MODEL travels in the config, not as a path:
    * the caller loads it once ([[QualityClassifier.readModel]]) and every
    * batch — first attempt and crash replay alike — scores under the same
    * frozen weights, the same replay-invariance contract as the span
    * scrub's per-batch hot-list freeze. Scoring is a pure per-row codegen
    * pass; the gate adds no shuffle to the ingest plan.
    */
  final case class QualityGateConfig(
      model: graft.functions.QualityClassifier.Model,
      minScoreE4: Long = 0L)

  /** Opt-in lang-id gate ([[graft.functions.QualityClassifier.classifyMulti]],
    * the q116 family): docs whose argmax class is outside `keep` are
    * rejected — the language-selection cut every multilingual curation
    * pipeline runs first. The K per-class models travel in the config
    * (frozen weights — the [[QualityGateConfig]] replay contract: retrain
    * on maintenance cadence only, never between a batch's first attempt
    * and its crash replay); the argmax is one codegen map pass, no
    * shuffle. Runs BEFORE the heuristic quality filter: it is the
    * cheapest large cut, and per-language quality thresholds downstream
    * should only ever see their own language.
    */
  final case class LangGateConfig(
      models: Seq[(String, graft.functions.QualityClassifier.Model)],
      keep: Set[String]) {
    require(models.nonEmpty, "lang gate needs at least one class model")
    require(keep.nonEmpty, "lang gate with an empty keep set rejects everything")
    require(keep.subsetOf(models.map(_._1).toSet),
      s"keep classes ${keep -- models.map(_._1).toSet} have no model")
  }

  /** Opt-in CCNet-style perplexity gate ([[graft.functions.LangModel]]):
    * docs whose mean transition log-prob under the installed reference
    * model exceeds `maxPplE4` are rejected (high = unlike the reference
    * corpus). The model is the PERSISTED artifact at `modelPath` —
    * integer tables, so scoring replays bit-identically — under the same
    * freeze contract as the span hot list: install/retrain the model on
    * maintenance cadence only, never between a batch's first attempt and
    * its crash replay. Sub-2-token docs score (0, 0) and pass; the length
    * heuristics own them.
    */
  final case class PerplexityGateConfig(
      modelPath: String,
      maxPplE4: Long)

  /** Opt-in FEED-cardinality monitor for [[ingestBatch]]: a persisted
    * [[graft.functions.Kmv]] sketch of the distinct texts the feed has
    * EVER offered (pre-gate, post-nothing — the raw batch), next to which
    * the exact-deduped lake's row count measures feed redundancy without
    * ever rescanning history. O(k) state: each batch folds its own
    * k-minima into the persisted set driver-side and republishes through
    * [[graft.functions.IndexProtocol.stagedReplace]]. Crash/replay-proof
    * by algebra rather than protocol: the merge is a set union of minima,
    * so re-applying a batch's hashes is a no-op — the one index-like
    * artifact here that needs no generation machinery. `k` is part of the
    * artifact's identity ([[ingestBatch]] refuses a mismatched sketch:
    * minima retained under a smaller k cannot be widened honestly).
    */
  final case class CardSketchConfig(k: Int = 256)

  /** Per-stage survivor counts of one ingest transaction — the curation
    * funnel every production pipeline logs ("200k in, 180k past quality,
    * 120k past dedup, 95k landed"). Stages that are not configured report
    * the previous stage's count (nothing dropped there), so the fields
    * always telescope: input ≥ afterQuality ≥ … ≥ accepted.
    */
  final case class FunnelReport(
      batchId: Long,
      input: Long,
      afterLang: Long,
      afterQuality: Long,
      afterClassifier: Long,
      afterPerplexity: Long,
      afterIntraDedup: Long,
      afterExactIndex: Long,
      afterDecontam: Long,
      afterRetrievalDecontam: Long,
      afterNearDup: Long,
      accepted: Long)

  /** Steady-state maintenance cadence for the ingest loop: every
    * `everyNBatches` committed batches, fold the lake's `__ver` partitions
    * and every index's generations up to the manifest high-water mark
    * ([[maintain]]). The cadence is what keeps per-object counts BOUNDED
    * rather than merely foldable: without it the loop accretes one lake
    * partition + one fp/sigs/bands generation per micro-batch (~525k/year
    * at a per-minute trigger) and listing overhead eventually dominates
    * every probe. With cadence K the live count oscillates in [1, K+1] —
    * the compaction cost is O(committed-state), so K trades fold frequency
    * against fold size; the default folds every 8 batches, keeping listing
    * O(10) while paying the fold ~12% of cycles. Runs inside foreachBatch
    * (serial, single-writer — the lock-free protocols' standing
    * assumption) and is crash-safe mid-fold: the lake fold is intent-
    * logged, the index folds are swap-in + startup recovery.
    */
  final case class MaintenanceConfig(
      everyNBatches: Int = 8,
      ivfHealth: Option[IvfHealthConfig] = None,
      pqHealth: Option[PqHealthConfig] = None) {
    // a zero cadence would divide-by-zero inside foreachBatch and kill the
    // stream on its first committed batch; fail at construction instead
    require(everyNBatches > 0, s"everyNBatches must be positive, got $everyNBatches")
  }

  /** Drift monitor thresholds for the served IVF index, run on the
    * maintenance cadence. Two trips, matching q79's gates:
    *   - SKEW: `max_list × n_cells > maxSkewRatio × n_vecs` — frozen
    *     centroids under a drifting corpus concentrate appends into few
    *     cells, creeping probe cost toward O(corpus);
    *   - RECALL: a sampled re-gate ([[Similarity.ivfIndexRecall]], the
    *     `sampleQueries` lowest vec_ids of the float-embedding lake as the
    *     deterministic probe set) below `minRecallPct` of k per query.
    * Either trip triggers [[Similarity.migrateIvfIndex]] — retrain NEW
    * centroids on the float-embedding lake (the int8 index cannot be
    * re-quantized from itself; retaining the floats is the price of being
    * able to migrate at all) and swap the rebuilt index in crash-safely.
    * `retrainK = None` keeps the serving index's current cell count.
    *
    * Cost model at 100 TB: the skew stats are an ids-only aggregate over
    * the lists table; the recall re-gate is one pass over the (4×-smaller)
    * int8 lists per Ο(sample) probe rows — both bounded, run every
    * `MaintenanceConfig.everyNBatches` cycles, not per serve. The
    * migration is the one O(corpus) repair and only runs when tripped.
    */
  final case class IvfHealthConfig(
      nProbe: Int = 4,
      k: Int = 10,
      sampleQueries: Int = 8,
      maxSkewRatio: Int = 10,
      minRecallPct: Int = 60,
      retrainIters: Int = 5,
      retrainK: Option[Int] = None)

  /** One health-check outcome: the pre-repair telemetry plus whether the
    * monitor tripped and the migration ran. */
  final case class IvfHealthReport(
      nCells: Long,
      nVecs: Long,
      maxList: Long,
      skewOk: Boolean,
      hits: Long,
      nQueries: Long,
      recallOk: Boolean,
      migrated: Boolean)

  /** One maintenance round: fold committed lake partitions and index
    * generations up to the current manifest high-water mark. Idempotent;
    * callable from any single-writer context (the streaming loop on its
    * [[MaintenanceConfig]] cadence, or a batch driver between ingest
    * calls).
    */
  def maintain(
      spark: SparkSession,
      paths: IngestPaths,
      health: Option[IvfHealthConfig] = None,
      pqHealth: Option[PqHealthConfig] = None): Option[IvfHealthReport] = {
    val upTo = lastApplied(spark, paths)
    if (upTo >= 0L) {
      compactCommitted(spark, paths, upTo)
      compactIndexes(spark, paths, upTo)
      // the hot-span list refreshes HERE and only here (no-op without a
      // span index): the scrub stage's replay-invariance argument rests on
      // the list being frozen between maintenance rounds
      Dedup.refreshHotSpanList(spark, paths.spanIndex)
      // the PQ monitor repairs as a side effect; its report is logged by
      // checkIvfPqHealth's callers that want it (the specs call it
      // directly) — maintain's return stays the int8 family's report
      pqHealth.foreach(checkIvfPqHealth(spark, paths, _))
      health.flatMap(checkIvfHealth(spark, paths, _))
    } else None
  }

  /** Run the drift monitor over the served IVF index and, when it trips,
    * the [[Similarity.migrateIvfIndex]] repair — closing the loop frozen
    * centroids leave open (q70 grows the index, q79 measures the cost of
    * freezing, this wires measurement to repair). No-op (None) when no
    * index is installed or no float-embedding corpus has been landed.
    * Single-writer contract as the rest of the loop: runs from the
    * foreachBatch cadence or a batch driver, never concurrent with appends.
    */
  def checkIvfHealth(
      spark: SparkSession,
      paths: IngestPaths,
      cfg: IvfHealthConfig): Option[IvfHealthReport] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(paths.ivfIndex), spark.sparkContext.hadoopConfiguration)
    // readable-index detection, not bare fs.exists — a build that crashed
    // mid-cells-write must read as "no index", like the dedup indexes
    val hasIndex = Similarity.ivfIndexReadable(spark, paths.ivfIndex)
    // same argument for the lake: an all-rejected embedding batch's
    // appendVersioned creates the root with NO data files, and a bare
    // fs.exists would send the recall gate onto a schema-less read that
    // throws inside foreachBatch and kills the stream on every restart
    // until float rows land (review finding)
    val hasCorpus = {
      val root = new org.apache.hadoop.fs.Path(paths.embLake)
      fs.exists(root) && {
        val it = fs.listFiles(root, true)
        var found = false
        while (!found && it.hasNext) {
          val f = it.next()
          found = f.isFile && f.getPath.getName.endsWith(".parquet")
        }
        found
      }
    }
    if (!hasIndex || !hasCorpus) return None

    // skew: ids-only distinct (the at-least-once append absorber) then an
    // exact int64 aggregate — cheap relative to any serve
    val sizes = spark.read.parquet(s"${paths.ivfIndex}/lists")
      .select(col("cell_id"), col("vec_id")).distinct()
      .groupBy("cell_id").agg(count(lit(1)).as("n"))
    val s = sizes.agg(
      count(lit(1)).as("n_cells"), sum(col("n")).as("n_vecs"),
      max(col("n")).as("max_list")).head()
    val (nCells, nVecs, maxList) = (s.getLong(0), s.getLong(1), s.getLong(2))
    val skewOk = maxList * nCells <= nVecs * cfg.maxSkewRatio

    // recall re-gate: deterministic sample — the lowest-id corpus vectors
    val corpus = spark.read.parquet(paths.embLake).drop("__ver")
    val probe = corpus.orderBy("vec_id").limit(cfg.sampleQueries)
    val r = Similarity.ivfIndexRecall(spark, paths.ivfIndex, probe, cfg.nProbe, cfg.k)
      .agg(coalesce(sum(col("hits")), lit(0L)), count(lit(1))).head()
    val (hits, nq) = (r.getLong(0), r.getLong(1))
    // denominator clamped to the ACHIEVABLE hits: an index with R residents
    // can serve at most R−1 neighbors per query (self excluded), so gating
    // on a flat k would make any index with R ≤ k·minRecallPct/100+1
    // residents fail forever and re-migrate on every maintenance cycle —
    // an O(corpus) rebuild loop that cannot raise the score (review finding)
    val achievable = math.min(cfg.k.toLong, math.max(nVecs - 1, 0L))
    val recallOk = hits * 100 >= nq * achievable * cfg.minRecallPct

    val tripped = !skewOk || !recallOk
    // Migration rebuilds the index FROM THE FLOAT LAKE (int8 lists cannot be
    // re-quantized from themselves), so it is only safe when the lake covers
    // every resident: an index installed offline over a corpus that never
    // flowed through this loop's embLake would be REPLACED by a rebuild
    // containing only the loop-ingested vectors — the "repair" would drop
    // the original corpus from serving, silently (review finding). Guard on
    // coverage; an uncovered install gets the report (so operators see the
    // trip) and a loud warning instead of data loss.
    val corpusCovers = tripped && {
      // MEMBERSHIP, not row counts: a lake with >= nVecs rows under the
      // wrong vec_id namespace would pass a count comparison and the
      // rebuild would still drop every resident not in the lake — the
      // anti-join asks the actual question (review finding). Cost is one
      // ids-only join on the (already-computed) distinct resident ids.
      val uncovered = spark.read.parquet(s"${paths.ivfIndex}/lists")
        .select("vec_id").distinct()
        .join(corpus.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
        .count()
      if (uncovered > 0) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"IVF health tripped but the embedding lake is missing $uncovered of $nVecs " +
            s"index residents — migration SKIPPED (it would drop the uncovered vectors). " +
            s"Backfill ${paths.embLake} with the install corpus's float vectors to enable repair.")
      }
      uncovered == 0
    }
    if (corpusCovers) {
      // the model's true cell count comes from the CELLS table, not from the
      // non-empty lists partitions: emptied cells would otherwise silently
      // shrink k on every migration (review finding)
      val k = cfg.retrainK.getOrElse(
        Similarity.readIvfCentroids(spark, paths.ivfIndex).length)
      Similarity.migrateIvfIndex(spark, paths.ivfIndex, corpus, k, cfg.retrainIters)
    }
    Some(IvfHealthReport(nCells, nVecs, maxList, skewOk, hits, nq, recallOk,
      migrated = corpusCovers))
  }

  /** Drift monitor thresholds for the IVF-PQ serving index — the
    * [[IvfHealthConfig]] contract for the PQ family (q93's monitor). Same
    * two trips: list SKEW under frozen coarse centroids, and a sampled
    * RECALL re-gate ([[Pq.ivfPqIndexRecall]] — pruned serve vs exhaustive
    * ADC over the same codes, so the monitor isolates what cell pruning
    * loses; quantization quality is fixed at install/migration time).
    * Either trip triggers [[Pq.migrateIvfPqIndex]]: retrain BOTH models
    * on the float-embedding lake (codes cannot be re-encoded from
    * themselves — the lake is what makes repair possible, exactly as for
    * the int8 family) and swap crash-safely. The default recall floor is
    * lower than the int8 monitor's: ADC recall feeds a re-ranking tier,
    * so the serving contract is shortlist quality, not final-rank
    * quality.
    */
  final case class PqHealthConfig(
      nProbe: Int = 4,
      k: Int = 10,
      sampleQueries: Int = 8,
      maxSkewRatio: Int = 10,
      minRecallPct: Int = 50,
      retrainKmIters: Int = 5,
      retrainPqIters: Int = 3,
      retrainCells: Option[Int] = None)

  /** One PQ health-check outcome — shape-identical to [[IvfHealthReport]]. */
  final case class PqHealthReport(
      nCells: Long,
      nVecs: Long,
      maxList: Long,
      skewOk: Boolean,
      hits: Long,
      nQueries: Long,
      recallOk: Boolean,
      migrated: Boolean)

  /** Run the drift monitor over the IVF-PQ serving index and, when it
    * trips, the [[Pq.migrateIvfPqIndex]] repair. Mirrors [[checkIvfHealth]]
    * guard-for-guard: readable-index + data-bearing-lake detection, the
    * achievable-hits recall clamp, and the lake-coverage anti-join that
    * refuses a migration which would drop residents the lake never saw.
    */
  def checkIvfPqHealth(
      spark: SparkSession,
      paths: IngestPaths,
      cfg: PqHealthConfig): Option[PqHealthReport] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(paths.ivfPqIndex), spark.sparkContext.hadoopConfiguration)
    val hasIndex = Pq.ivfPqIndexReadable(spark, paths.ivfPqIndex)
    val hasCorpus = {
      val root = new org.apache.hadoop.fs.Path(paths.embLake)
      fs.exists(root) && {
        val it = fs.listFiles(root, true)
        var found = false
        while (!found && it.hasNext) {
          val f = it.next()
          found = f.isFile && f.getPath.getName.endsWith(".parquet")
        }
        found
      }
    }
    if (!hasIndex || !hasCorpus) return None

    val sizes = spark.read.parquet(s"${paths.ivfPqIndex}/lists")
      .select(col("cell_id"), col("vec_id")).distinct()
      .groupBy("cell_id").agg(count(lit(1)).as("n"))
    val s = sizes.agg(
      count(lit(1)).as("n_cells"), sum(col("n")).as("n_vecs"),
      max(col("n")).as("max_list")).head()
    val (nCells, nVecs, maxList) = (s.getLong(0), s.getLong(1), s.getLong(2))
    val skewOk = maxList * nCells <= nVecs * cfg.maxSkewRatio

    val corpus = spark.read.parquet(paths.embLake).drop("__ver")
    val probe = corpus.orderBy("vec_id").limit(cfg.sampleQueries)
    val r = Pq.ivfPqIndexRecall(spark, paths.ivfPqIndex, probe, cfg.nProbe, cfg.k)
      .agg(coalesce(sum(col("hits")), lit(0L)), count(lit(1))).head()
    val (hits, nq) = (r.getLong(0), r.getLong(1))
    val achievable = math.min(cfg.k.toLong, math.max(nVecs - 1, 0L))
    val recallOk = hits * 100 >= nq * achievable * cfg.minRecallPct

    val tripped = !skewOk || !recallOk
    val corpusCovers = tripped && {
      val uncovered = spark.read.parquet(s"${paths.ivfPqIndex}/lists")
        .select("vec_id").distinct()
        .join(corpus.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
        .count()
      if (uncovered > 0) {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"IVF-PQ health tripped but the embedding lake is missing $uncovered of $nVecs " +
            s"index residents — migration SKIPPED (it would drop the uncovered vectors). " +
            s"Backfill ${paths.embLake} with the install corpus's float vectors to enable repair.")
      }
      uncovered == 0
    }
    if (corpusCovers) {
      val k = cfg.retrainCells.getOrElse(
        Similarity.readIvfCentroids(spark, paths.ivfPqIndex).length)
      Pq.migrateIvfPqIndex(spark, paths.ivfPqIndex, corpus,
        nCells = k, kmIters = cfg.retrainKmIters, pqIters = cfg.retrainPqIters)
    }
    Some(PqHealthReport(nCells, nVecs, maxList, skewOk, hits, nq, recallOk,
      migrated = corpusCovers))
  }

  /** Gopher/C4-shaped acceptance: keep docs whose [[Text.qualityBucket]] is
    * an OK bucket (length bounds pass; terse vs fluent both land).
    */
  def qualityFilter(df: DataFrame, textCol: String = "text"): DataFrame =
    df.filter(Text.qualityBucket(col(textCol)).startsWith("OK"))

  /** Snapshot-consistent read of the COMMITTED doc lake (round-14 verdict
    * stretch #8 — the __ver/manifest half of the SnapshotLake
    * adjudication, see PLANS.md "Snapshot isolation boundaries of the
    * ingest lake"): the manifest high-water mark is read FIRST — that is
    * the pin — and the scan keeps only `__ver <= it`. Committed
    * partitions are immutable (a committed replay no-ops before touching
    * the lake; an uncommitted crash-replay rewrites byte-identical
    * content BEFORE the manifest moves), and the one non-atomic window
    * in the append path — dynamic partition overwrite committing its
    * files one by one — only ever touches the UNCOMMITTED partition the
    * pin excludes. So this read is repeatable across any number of
    * concurrent [[ingestBatch]] cycles, exactly a [[graft.sinks
    * .SnapshotLake]] pin. The equivalence does NOT extend to a
    * concurrent [[compactCommitted]]/[[maintain]]: the fold's
    * post-swap/pre-delete window double-counts folded rows on BOTH sides
    * of the filter (spec-pinned), so always-on readers racing
    * maintenance belong on SnapshotLake; this API serves the loop's own
    * between-maintenance read points.
    */
  def readCommitted(
      spark: SparkSession, paths: IngestPaths, upToBatch: Long = -1L): DataFrame = {
    val applied = lastApplied(spark, paths)
    // a pin above the manifest would admit the in-flight partition whose
    // dynamic-overwrite job commit is exactly the non-atomic window this
    // API exists to exclude (review finding); and an empty lake fails
    // LOUDLY like SnapshotLake.pin — there is no schema to return empty
    if (applied < 0) throw new IllegalStateException(
      s"ingest lake at ${paths.docLake} has no committed batch to pin")
    require(upToBatch <= applied,
      s"cannot pin uncommitted batch $upToBatch (manifest high-water mark $applied)")
    val pin = if (upToBatch >= 0) upToBatch else applied
    // A pin BELOW the lake's oldest surviving partition is a compacted-away
    // read point: the fold relabels every batch <= its boundary into the
    // boundary partition, so `__ver <= pin` would silently return an empty
    // (or truncated) lake instead of the pinned batches — the exact
    // silent-garbage serve the r16 stretch adjudication warned about when
    // maintenance crosses a pin (spec: SubmitSpec "serve survives a
    // compaction crossing the pin"). Loud, driver-side (one directory
    // listing, no job): the caller either pins >= the fold boundary (the
    // loop's own read points) or serves from a SnapshotLake generation.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(paths.docLake), spark.sparkContext.hadoopConfiguration)
    val vers = fs.listStatus(new org.apache.hadoop.fs.Path(paths.docLake))
      .map(_.getPath.getName).filter(_.startsWith("__ver="))
      .map(_.stripPrefix("__ver=").toLong)
    if (vers.nonEmpty) require(pin >= vers.min,
      s"pin batch=$pin predates the oldest committed partition __ver=${vers.min} — " +
        "a compaction has folded the pinned batches; pin at or above the fold " +
        "boundary, or serve always-on readers from a SnapshotLake generation")
    spark.read.parquet(paths.docLake).filter(col("__ver") <= pin)
  }

  /** Fold one batch's k-minima over the raw feed text into the persisted
    * sketch (see [[CardSketchConfig]]): one bounded aggregate ships ≤ k
    * hashes to the driver, the union with the persisted set is O(k), and
    * the artifact republishes through the staged swap (whose writer-side
    * recovery heals a parked crash). A k recorded in the artifact
    * different from the config's fails loudly — minima retained under one
    * k are not a valid sketch under another.
    */
  private def foldCardSketch(
      spark: SparkSession, paths: IngestPaths, batch: DataFrame,
      textCol: String, cfg: CardSketchConfig): Unit = {
    import spark.implicits._
    val batchMins = batch
      .select(Dedup.tokenHash64(col(textCol)).as("h")).as[Long]
      .select(new Kmv.MinSet(cfg.k).toColumn)
      .head().mins
    val existing = readCardMins(spark, paths)
    existing.foreach { case (k, _) =>
      require(k == cfg.k,
        s"feed sketch at ${paths.cardSketch} was built with k=$k but the batch is " +
          s"configured with k=${cfg.k} — delete the sketch to restart monitoring " +
          "under a new k")
    }
    val merged = Kmv.mergeMins(existing.map(_._2).getOrElse(Nil), batchMins, cfg.k)
    IndexProtocol.stagedReplace(spark, paths.cardSketch) { stage =>
      merged.toDF("h").coalesce(1).write.parquet(s"$stage/mins")
      IndexProtocol.writeLayoutPayload(spark, stage, s"kmv=1,k=${cfg.k}")
    }
  }

  /** (k, sorted minima) of the persisted feed sketch; None when no sketch
    * exists. HEAL-FREE like [[lastApplied]]: mid-swap the parked `__old`
    * artifact is read in place — renames belong to the writer only.
    */
  private def readCardMins(
      spark: SparkSession, paths: IngestPaths): Option[(Int, Seq[Long])] = {
    import spark.implicits._
    val fs = IndexProtocol.fileSystem(spark, paths.cardSketch)
    val live = paths.cardSketch
    val parked = paths.cardSketch + graft.sinks.Sinks.OldSuffix
    val at = Seq(live, parked, live) // re-check live: writer may finish mid-read
      .find(p => fs.exists(IndexProtocol.layoutPath(p)))
    at.map { p =>
      val payload = IndexProtocol.readLayoutPayload(spark, p)
      val kv = payload.split(",").map(_.split("=", 2)).collect {
        case Array(a, b) => a -> b
      }.toMap
      require(kv.get("kmv").contains("1"),
        s"feed sketch at $p has layout '$payload' — not a kmv=1 artifact")
      val mins = spark.read.parquet(s"$p/mins").orderBy("h").as[Long].collect().toSeq
      (kv("k").toInt, mins)
    }
  }

  /** The feed's distinct-text cardinality summary from the persisted
    * sketch ([[CardSketchConfig]]); loud on a missing sketch — a monitor
    * that silently reports 0 on a mistyped root is the q124 strict-path
    * lesson again.
    */
  def feedCardinality(
      spark: SparkSession, paths: IngestPaths): graft.functions.Kmv.KmvSummary = {
    val (k, mins) = readCardMins(spark, paths).getOrElse(throw new IllegalStateException(
      s"no feed sketch at ${paths.cardSketch} — run ingest with CardSketchConfig"))
    Kmv.summarize(mins, k)
  }

  /** High-water mark of applied batch ids; -1 when no batch has committed.
    *
    * STRICTLY READ-ONLY: concurrent readers (the `serve` job, snapshot
    * pins, compaction preflights) must never mutate the manifest — a
    * reader renaming `__old` back during the writer's park→publish window
    * would break the single-writer swap (and fail the writer's publish
    * rename on filesystems where rename-to-existing returns false). When
    * the live record is absent mid-swap, the PARKED value at `__old` is
    * read in place — that is the pre-publish high-water mark, so the
    * record can be delayed by one batch (the in-flight batch just
    * replays, byte-identical) but can never be lost. The rename-based
    * heal lives only on the writer path ([[recordApplied]]).
    */
  def lastApplied(spark: SparkSession, paths: IngestPaths): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(paths.manifest), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(paths.manifest)
    val old = new org.apache.hadoop.fs.Path(paths.manifest + "__old")
    def read(path: org.apache.hadoop.fs.Path): Option[Long] =
      try {
        val in = fs.open(path)
        try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
        finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    // Final re-read of the live path covers the only doubly-absent race:
    // the writer published (tmp -> p) and cleared the park between our
    // two reads — by then the NEW record is live.
    read(p).orElse(read(old)).orElse(read(p)).getOrElse(-1L)
  }

  /** Restore the commit record when a [[recordApplied]] crash left it
    * parked at `__old` (between the publish's two renames). Restoring the
    * PARKED value — not adopting the staged `__tmp` — is always safe: the
    * batch whose publish crashed replays from its commit gate and rewrites
    * byte-identical content before republishing. No-op when the live
    * manifest exists (then any surviving `__old`/`__tmp` are stale debris
    * of a COMPLETED publish, cleared by the next one).
    */
  private def recoverManifest(
      fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): Unit = {
    val old = new org.apache.hadoop.fs.Path(p.toString + "__old")
    // Hadoop rename reports failure as `false`, not an exception — a
    // silent false here would leave the record parked and the caller
    // reading -1 on a healthy lake, the exact state this heals
    if (!fs.exists(p) && fs.exists(old))
      require(fs.rename(old, p), s"manifest recovery rename failed: $old -> $p")
  }

  /** Publish the manifest through a park-based swap (the staged-generation
    * discipline every other artifact in the loop already follows): the
    * previous record moves aside to `__old` instead of being deleted, so
    * there is NO window in which the lake's only commit record ceases to
    * exist — a crash at any point leaves it live, parked, or already
    * replaced, and [[recoverManifest]] heals the parked state.
    */
  private def recordApplied(spark: SparkSession, paths: IngestPaths, batchId: Long): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(paths.manifest), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(paths.manifest)
    val tmp = new org.apache.hadoop.fs.Path(paths.manifest + "__tmp")
    val old = new org.apache.hadoop.fs.Path(paths.manifest + "__old")
    recoverManifest(fs, p)
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8"))
    finally out.close()
    fs.delete(old, false) // stale park of a completed publish, if any
    // renames fail as `false` on Hadoop filesystems — each one unchecked
    // would let recordApplied return "committed" with the record parked
    // or still staged
    if (fs.exists(p))
      require(fs.rename(p, old), s"manifest park rename failed: $p -> $old")
    require(fs.rename(tmp, p), s"manifest publish rename failed: $tmp -> $p")
    fs.delete(old, false)
  }

  /** One ingest transaction. Returns the number of accepted (landed) docs;
    * 0 for a replayed already-committed batch.
    *
    * `embedBatch`, when present, carries (vec_id, embedding) rows for the
    * batch's docs; they are appended to the served IVF index if one is
    * installed under [[IngestPaths.ivfIndex]] (the centroid model is trained
    * offline and installed via [[Similarity.writeIvfIndex]] — ingest grows
    * the index, it never retrains it). Embeddings are appended for the
    * ACCEPTED docs only: `vec_id` must equal the doc id for the filter to
    * apply; rows for rejected docs are dropped.
    */
  def ingestBatch(
      spark: SparkSession,
      paths: IngestPaths,
      batch: DataFrame,
      batchId: Long,
      embedBatch: Option[DataFrame] = None,
      textCol: String = "text",
      idCol: String = "doc_id",
      nearDup: Option[NearDupConfig] = None,
      semanticDedup: Option[SemanticDedupConfig] = None,
      decontam: Option[DecontamConfig] = None,
      retrievalDecontam: Option[RetrievalDecontamConfig] = None,
      spanScrub: Option[SpanScrubConfig] = None,
      langGate: Option[LangGateConfig] = None,
      qualityGate: Option[QualityGateConfig] = None,
      perplexityGate: Option[PerplexityGateConfig] = None,
      cardSketch: Option[CardSketchConfig] = None,
      funnelSink: Option[FunnelReport => Unit] = None): Long = {
    if (batchId <= lastApplied(spark, paths)) return 0L

    // FEED-cardinality monitor (opt-in, observational): fold this batch's
    // k-minima over the RAW feed text into the persisted sketch. Runs
    // before any gate on purpose (it measures what the feed OFFERS, the
    // lake measures what survived) and before the commit point so a crash
    // replay re-folds — harmlessly, the minima union is idempotent.
    cardSketch.foreach(cfg => foldCardSketch(spark, paths, batch, textCol, cfg))

    // HOT-SPAN SCRUB first (opt-in, rewrite-not-gate — see SpanScrubConfig):
    // quality and every dedup fingerprint must see the text that will land.
    // Replay-invariant: the hot list only moves on the maintenance cadence,
    // which runs after COMMITTED batches — inside one batch's crash window
    // the list is frozen, so the rewrite (and everything downstream of it)
    // recomputes identically. The BOOTSTRAP batch scrubs too, against an
    // explicit empty list: spanBootstrap flips mid-batch (the span index
    // commits at the spanScrub.foreach below, BEFORE the fp commit point),
    // so a crash in that window replays with spanBootstrap=false — if the
    // first attempt had landed VERBATIM text, the replay's re-render
    // (single-spacing, arming-independent) would compute different text
    // and a different __fp than the landed rows and the already-published
    // generation-0 counts (round-11 advice). Scrubbing both sides with the
    // same k makes first attempt and replay byte-identical.
    val spanBootstrap = spanScrub.isDefined &&
      !Dedup.spanCountIndexReadable(spark, paths.spanIndex)
    val scrubbed = spanScrub match {
      case Some(cfg) if spanBootstrap =>
        // empty single-LONG-column frame: zero spans removed, text still
        // re-rendered exactly as every post-bootstrap batch renders it
        Text.scrubAgainstHotList(batch, textCol, idCol, cfg.k,
          spark.range(0).toDF(), cfg.maxBroadcastHot)
      case Some(cfg) =>
        val (k, _) = Dedup.readSpanLayout(spark, paths.spanIndex)
        Text.scrubAgainstHotList(batch, textCol, idCol, k,
          Dedup.readHotSpanList(spark, paths.spanIndex), cfg.maxBroadcastHot)
      case None => batch
    }

    // LANG-ID gate first among the content gates (opt-in — see
    // LangGateConfig): one argmax map pass, original columns restored.
    // The gate's bookkeeping columns are added by NAME (withColumn
    // replaces same-named batch columns, and the restoring select would
    // then land gate values in the lake as the user's data — round-14
    // advice), so a batch that already carries them is rejected loudly.
    def requireNoGateCollision(gate: String, reserved: Seq[String]): Unit = {
      val clash = scrubbed.columns.toSet.intersect(reserved.toSet)
      require(clash.isEmpty,
        s"$gate gate bookkeeping columns collide with batch columns: " +
          s"${clash.toSeq.sorted.mkString(", ")} — rename them before ingest")
    }
    val langClean = langGate match {
      case Some(cfg) =>
        // the reserved set must include the gate's INTERNAL scratch
        // names too (review finding: a batch column named like a scratch
        // column is replaced just as silently as a bookkeeping one)
        requireNoGateCollision("lang",
          Seq("pred", "n_feats", "__q_multi", "__q_best") ++
            cfg.models.map { case (c, _) => s"score_${c}_e4" })
        graft.functions.QualityClassifier
          .classifyMulti(scrubbed, textCol, cfg.models)
          .filter(col("pred").isin(cfg.keep.toSeq: _*))
          .select(scrubbed.columns.map(col): _*)
      case None => scrubbed
    }
    val heuristicClean = qualityFilter(langClean, textCol)
    val classifierClean = qualityGate match {
      case Some(cfg) =>
        // same defect class as the lang gate: drop() would delete a
        // user column shadowed by the gate's scratch names — including
        // classify's internal "__q" (review finding)
        requireNoGateCollision("quality",
          Seq("n_feats", "score_e4", "label", "__q"))
        graft.functions.QualityClassifier
          .classify(heuristicClean, textCol, cfg.model, cfg.minScoreE4)
          .filter(col("label") === "keep")
          .drop("n_feats", "score_e4", "label")
      case None => heuristicClean
    }
    val cleaned = perplexityGate match {
      case Some(cfg) =>
        val fluent = graft.functions.LangModel
          .scoreDocs(classifierClean, textCol, idCol, cfg.modelPath)
          .filter(col("ppl_e4") <= cfg.maxPplE4)
          .select(col(idCol))
        classifierClean.join(fluent, Seq(idCol), "left_semi")
      case None => classifierClean
    }
    // intra-batch exact dedup, deterministic winner (min id per content).
    // __fp is KEPT and threaded through the fp probe and the commit-point
    // append (fpCol = "__fp") — one md5 pass over the batch text per cycle
    // instead of three (review finding); it is dropped before any row
    // leaves for the lake
    val intra = Cleaning
      .dedupByKey(
        cleaned.withColumn("__fp", Text.fingerprintBinary(col(textCol))),
        Seq("__fp"), Seq(col(idCol).asc))

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(paths.fpIndex), spark.sparkContext.hadoopConfiguration)
    // readable-index detection, NOT bare fs.exists: a build that crashed
    // between its layout write and the first generation's atomic publish
    // leaves a layout-only directory, and probing it throws on the
    // data-less read — every replay would then crash identically instead
    // of re-running the bootstrap build (round-9 advice; the builders
    // delete the debris when they rebuild)
    val bootstrap = !Dedup.fingerprintIndexReadable(spark, paths.fpIndex)
    val afterExact =
      if (bootstrap) intra
      else Dedup.dedupAgainstFingerprintIndex(
        spark, paths.fpIndex, intra, textCol, idCol, fpCol = Some("__fp"))
    // DECONTAMINATION gate (opt-in): a static blocklist probe, so it sits
    // before the approximate stages — see DecontamConfig. Skipped (like
    // every index stage) while no readable index is installed — but LOUDLY:
    // unlike the dedup indexes this gate cannot bootstrap from ingest data,
    // so "no index" means every batch in the window lands unscreened and
    // the leakage is permanent once the fps commit. The install itself is
    // swap-atomic (writeEvalIndex) and evalIndexReadable self-heals a
    // crashed swap, so in a correctly-operated install this branch only
    // fires before the first install.
    val afterDecontam = decontam match {
      case Some(cfg) if Dedup.evalIndexReadable(spark, paths.evalIndex) =>
        Dedup.dedupAgainstEvalIndex(
          spark, paths.evalIndex, afterExact, textCol, idCol, cfg.minSharedFps)
      case Some(_) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"decontamination configured but no readable eval index at ${paths.evalIndex} — " +
            s"batch $batchId ingested UNSCREENED; install the blocklist with Dedup.writeEvalIndex")
        afterExact
      case None => afterExact
    }
    // RETRIEVAL decontamination (opt-in): one layer deeper than the
    // winnowing blocklist — near-verbatim/paraphrase overlap with the
    // eval suites' shingle index. Same static-blocklist properties as the
    // stage above (replay-trivial, fail-open LOUDLY when no index is
    // installed — the leakage-screening gap must never be silent).
    val afterRetrieval = retrievalDecontam match {
      case Some(cfg) if scala.util.Try(
          graft.functions.Bm25.readMeta(spark, cfg.indexPath)).isSuccess =>
        val flagged = graft.functions.Bm25
          .contaminationReport(afterDecontam, textCol, idCol,
            cfg.indexPath, cfg.thresholdE6)
          .filter(col("contaminated") === 1L)
          .select(col("doc_id").as("__contaminated_id"))
        afterDecontam.join(flagged,
          afterDecontam(idCol) === col("__contaminated_id"), "left_anti")
      case Some(cfg) =>
        val msg = s"retrieval decontamination configured but no readable BM25 index at " +
          s"${cfg.indexPath} — batch $batchId would ingest UNSCREENED; install the " +
          "eval-suite index with Bm25.buildIndex"
        // strict by default: this path is user-supplied (unlike the
        // winnowing gate's well-known evalIndex), so a permanent typo must
        // fail the batch, not WARN forever (r15 advice)
        if (cfg.strict) throw new IllegalStateException(msg)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
        afterDecontam
      case None => afterDecontam
    }
    // NEAR-dup stage (opt-in): after the exact stage — identical content is
    // already gone, so band probes only ever verify near-misses — and
    // before the lake write, so acceptance is settled when rows land. The
    // probe is replay-invariant by construction: a crash-replay may find
    // its own batch's band generation already published, but
    // dedupAgainstBandIndex excludes the batch's own ids from collisions,
    // so acceptance recomputes identically in every crash window.
    val bandBootstrap = nearDup.isDefined &&
      !Dedup.bandIndexReadable(spark, paths.bandIndex)
    val afterBand = nearDup match {
      case Some(cfg) if !bandBootstrap =>
        Dedup.dedupAgainstBandIndex(spark, paths.bandIndex, afterRetrieval, textCol, idCol,
          cfg.nHashes, cfg.nBands, cfg.minEstJaccard, cfg.seed, cfg.maxBandCollisions)
      case _ => afterRetrieval
    }
    // SEMANTIC stage last among the acceptance gates: text stages already
    // own identical/lexically-near content, so the vector probe pays only
    // for paraphrase-grade duplicates. Docs with no embedding row pass
    // through unprobed (can't probe what has no vector); the probe's
    // batch-id exclusion keeps crash-replays (own vectors possibly already
    // appended) acceptance-identical.
    val afterSemantic = (semanticDedup, embedBatch) match {
      // readable-index detection, not bare fs.exists (same round-9 argument
      // as the fp/band probes: mid-write debris must not select the probe
      // path, which would throw on the data-less read and crash-loop replays)
      case (Some(cfg), Some(emb)) if Similarity.ivfIndexReadable(spark, paths.ivfIndex) =>
        val batchEmb = emb.join(
          afterBand.select(col(idCol).as("vec_id")), Seq("vec_id"), "left_semi")
        val survivorIds = Similarity
          .dedupAgainstIvfIndex(spark, paths.ivfIndex, batchEmb, cfg.nProbe, cfg.minSim)
          .select(col("vec_id").as(idCol))
        val embIds = emb.select(col("vec_id").as(idCol))
        afterBand.join(embIds, Seq(idCol), "left_anti")
          .unionByName(afterBand.join(survivorIds, Seq(idCol), "left_semi"))
      case (Some(_), _) =>
        // configured but unprobeable — same fail-open situation the decontam
        // arm warns about: this stage cannot bootstrap from ingest data, so
        // a missing install (or an embedding-less stream) means paraphrase
        // duplicates land while the operator believes the gate is active
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"semantic dedup configured but ${if (embedBatch.isEmpty) "the batch carries no embeddings"
            else s"no readable IVF index at ${paths.ivfIndex}"} — batch $batchId ingested without the vector gate")
        afterBand
      case _ => afterBand
    }
    val accepted = afterSemantic.persist() // consumers below; unpersisted before return

    // Opt-in observability: one count per stage, telescoping input →
    // accepted. Each count re-executes its stage prefix (the stages are
    // lazy filters), so this is a monitoring-cadence tool, not a per-batch
    // default — acceptance itself never depends on it, and a crash between
    // the report and the commit point just reports again on replay.
    funnelSink.foreach { sink =>
      sink(FunnelReport(
        batchId = batchId,
        input = batch.count(),
        afterLang = langClean.count(),
        afterQuality = heuristicClean.count(),
        afterClassifier = classifierClean.count(),
        afterPerplexity = cleaned.count(),
        afterIntraDedup = intra.count(),
        afterExactIndex = afterExact.count(),
        afterDecontam = afterDecontam.count(),
        afterRetrievalDecontam = afterRetrieval.count(),
        afterNearDup = afterBand.count(),
        accepted = accepted.count()))
    }

    try {
      // WRITE ORDER IS LOAD-BEARING. The fingerprint append is the batch's
      // dedup COMMIT POINT: once it lands, a replay recomputes accepted = ∅
      // (its own rows are now "history") and every later step no-ops. So
      // every write that needs the recomputed accepted set must come BEFORE
      // it: crash before the lake/IVF writes → replay redoes them from the
      // same accepted set (lake: dynamic overwrite of its own partition;
      // IVF: duplicate rows absorbed at serve time); crash after the fp
      // append → replay is a pure no-op and only records the manifest.
      // Either way the terminal state is identical. The commit point itself
      // is ALL-OR-NOTHING: the fp batch publishes as one `batch=<id>`
      // directory via a single atomic rename (Sinks.publishDir) — a
      // parquet append's file-at-a-time job commit could crash half-visible,
      // and a replay probing that partial set would recompute a smaller
      // accepted set and overwrite the lake partition without the
      // partially-indexed docs (dropped forever, fps still blocking
      // re-entry). With the rename there is no partial state to observe.
      Sinks.appendVersioned(accepted.drop("__fp"), paths.docLake, batchId)
      embedBatch.foreach { emb =>
        val acceptedEmb = emb.join(
          accepted.select(col(idCol).as("vec_id")), Seq("vec_id"), "left_semi")
        // float embeddings land in their own versioned lake (same dynamic-
        // overwrite replay contract as the doc lake): the int8 IVF index
        // cannot be re-quantized from itself, so the floats are what makes
        // a health-tripped migrateIvfIndex possible at all
        Sinks.appendVersioned(acceptedEmb, paths.embLake, batchId)
        if (Similarity.ivfIndexReadable(spark, paths.ivfIndex)) {
          Similarity.appendToIvfIndex(spark, paths.ivfIndex, acceptedEmb)
        }
        // the SERVING-tier IVF-PQ index (q92's family) rides the same
        // presence-driven contract as the int8 index above: install it
        // once offline (Pq.writeIvfPqIndex) and every accepted batch's
        // vectors encode against its frozen models in one linear pass —
        // the loop keeps the 16-byte serving codes fresh without the
        // serving tier ever rescanning the lake. Replayed appends are
        // absorbed by queryIvfPqIndex's distinct, like the int8 family.
        if (Pq.ivfPqIndexReadable(spark, paths.ivfPqIndex)) {
          Pq.appendToIvfPqIndex(spark, paths.ivfPqIndex, acceptedEmb)
        }
      }
      val n = accepted.count()
      // band generations publish BEFORE the fp commit point: each is its
      // own atomic rename (sigs first, bands second — see appendBandIndex),
      // every prefix of which leaves the replayed probe's acceptance
      // unchanged (own-batch exclusion above), and the completed replay
      // re-publishes whatever is missing.
      //
      // EMPTY accepted sets write NO index state (n > 0 guards): a
      // partitioned write of an empty DataFrame commits a directory with no
      // parquet files, so an all-rejected FIRST batch would bootstrap a
      // layout-plus-data-less index — the probe read throws on it and every
      // later batch crash-loops (review finding; indexReadable now also
      // rejects data-less generations, this guard keeps the debris from
      // being written at all). Skipping the append for an empty batch is
      // semantically free: there is nothing to index, and the manifest (not
      // the index generation) is what makes the replay no-op.
      if (n > 0) {
        // span counts publish BEFORE the fp commit point, like the band
        // generations: a crash after the fp append replays with accepted=∅
        // and the n>0 guard would skip a not-yet-published count generation
        // forever. Counts are of the text that LANDED (post-scrub): the
        // index describes the lake corpus, and a span already hot keeps its
        // tripped count rather than re-accumulating occurrences it scrubs.
        spanScrub.foreach { cfg =>
          if (spanBootstrap)
            Dedup.writeSpanCountIndex(accepted, paths.spanIndex, textCol,
              cfg.k, cfg.minCount, generation = batchId)
          else Dedup.appendSpanCounts(accepted, paths.spanIndex, batchId, textCol)
        }
        nearDup.foreach { cfg =>
          if (bandBootstrap)
            Dedup.writeBandIndex(accepted, paths.bandIndex, textCol, idCol,
              cfg.nHashes, cfg.nBands, cfg.seed, generation = batchId,
              bpMod = cfg.bpMod)
          else
            Dedup.appendBandIndex(accepted, paths.bandIndex, batchId, textCol, idCol,
              cfg.nHashes, cfg.nBands, cfg.seed)
        }
        if (bootstrap)
          Dedup.writeFingerprintIndex(accepted, paths.fpIndex, textCol, idCol,
            generation = batchId, fpCol = Some("__fp"))
        else Dedup.appendFingerprintIndex(accepted, paths.fpIndex, batchId, textCol, idCol,
          fpCol = Some("__fp"))
      }
      recordApplied(spark, paths, batchId)
      n
    } finally accepted.unpersist()
  }

  // ---------------------------------------------------------------------
  // Lake maintenance: consolidate committed __ver partitions.
  //
  // The ingest loop writes ONE `__ver=batchId` partition per micro-batch —
  // the price of idempotent replays. At a per-minute trigger cadence that
  // is ~525k partitions/year: the listing/footer overhead comes to dominate
  // every scan long before the data does. compactCommitted folds all
  // partitions ≤ upToBatch into a single one. Only COMMITTED batches are
  // eligible (≤ the manifest high-water mark): the manifest gate guarantees
  // no replay of a compacted batch can ever run, so losing the per-batch
  // partition boundaries loses nothing the replay protocol still needs.
  //
  // Crash safety is an INTENT LOG, not a lock: after staging the
  // consolidated partition, a `_compact_intent` marker (temp+rename, never
  // half-written) records the swap target and the directories to delete.
  // From that point the compaction is re-executable from the marker alone:
  // [[recoverCompaction]] finishes the swap (two-rename [[Sinks.swapIn]],
  // itself crash-recoverable) and the deletes, each step idempotent. A
  // crash BEFORE the intent lands leaves only an orphaned staging dir —
  // the lake itself is untouched. The one observable window is
  // post-swap/pre-delete, where a naive reader double-counts the
  // not-yet-deleted originals; the single-writer ingest loop owns that by
  // running recoverCompaction on startup (and [[ingestBatch]] is unaffected
  // — it reads only the fp index and manifest, never the lake).
  // ---------------------------------------------------------------------

  private val VerPrefix = "__ver="

  /** One versioned lake the compaction protocol manages: the doc lake and
    * the float-embedding lake share the identical `__ver=` layout and fold
    * contract, differing only in location and intent-marker name (each lake
    * owns its own marker so their crash recoveries are independent). */
  private[pipeline] final case class LakeRef(lakePath: String, intentName: String)
  private def docLakeRef(paths: IngestPaths) = LakeRef(paths.docLake, "_compact_intent")
  private def embLakeRef(paths: IngestPaths) = LakeRef(paths.embLake, "_compact_intent_emb")

  private def lakeFs(spark: SparkSession, lake: LakeRef) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(lake.lakePath), spark.sparkContext.hadoopConfiguration)

  private def intentPath(paths: IngestPaths, lake: LakeRef) =
    new org.apache.hadoop.fs.Path(paths.root, lake.intentName)
  private def stageRoot(lake: LakeRef) =
    new org.apache.hadoop.fs.Path(lake.lakePath + "__compact_tmp")
  private def trashRoot(lake: LakeRef) =
    new org.apache.hadoop.fs.Path(lake.lakePath + Sinks.OldSuffix)

  /** The re-executable compaction plan the intent marker encodes: fold the
    * `deleteDirs` partitions (and any existing target partition) into
    * `__ver=<upTo>`, whose consolidated rows are staged under
    * [[stageRoot]].
    */
  private[pipeline] final case class CompactionIntent(upTo: Long, deleteDirs: Seq[String])

  private def writeIntent(
      spark: SparkSession, paths: IngestPaths, lake: LakeRef,
      intent: CompactionIntent): Unit = {
    val fs = lakeFs(spark, lake)
    val marker = intentPath(paths, lake)
    val tmp = new org.apache.hadoop.fs.Path(marker.toString + "__tmp")
    val out = fs.create(tmp, true)
    try out.write((intent.upTo.toString +: intent.deleteDirs).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(marker)) fs.delete(marker, false)
    fs.rename(tmp, marker)
  }

  private def readIntent(
      spark: SparkSession, paths: IngestPaths, lake: LakeRef): Option[CompactionIntent] = {
    val fs = lakeFs(spark, lake)
    val marker = intentPath(paths, lake)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      val lines =
        try new String(in.readAllBytes(), "UTF-8").split("\n").toSeq
        finally in.close()
      Some(CompactionIntent(lines.head.trim.toLong, lines.tail.filter(_.nonEmpty)))
    }
  }

  /** Stage the consolidated partition and record the intent marker. Returns
    * None when fewer than two partitions are eligible (nothing to fold).
    * Split from [[finishCompaction]] so the spec can exercise each crash
    * window; production callers use [[compactCommitted]].
    */
  private[pipeline] def stageCompaction(
      spark: SparkSession, paths: IngestPaths, upToBatch: Long): Option[CompactionIntent] =
    stageCompaction(spark, paths, docLakeRef(paths), upToBatch)

  private def stageCompaction(
      spark: SparkSession, paths: IngestPaths, lakeRef: LakeRef,
      upToBatch: Long): Option[CompactionIntent] = {
    val fs = lakeFs(spark, lakeRef)
    val lake = new org.apache.hadoop.fs.Path(lakeRef.lakePath)
    if (!fs.exists(lake)) return None
    val eligible = fs.listStatus(lake).map(_.getPath.getName)
      .filter(_.startsWith(VerPrefix))
      .filter(_.drop(VerPrefix.length).toLong <= upToBatch)
      .sorted.toSeq
    if (eligible.size < 2) return None
    // partition pruning keeps this read to the eligible directories; the
    // partition column itself lives in the directory name, so the staged
    // files must not carry it
    val consolidated = spark.read.parquet(lakeRef.lakePath)
      .filter(col("__ver").cast("long") <= upToBatch)
      .drop("__ver")
    fs.delete(stageRoot(lakeRef), true)
    consolidated.write.parquet(
      new org.apache.hadoop.fs.Path(stageRoot(lakeRef), s"$VerPrefix$upToBatch").toString)
    val intent = CompactionIntent(
      upToBatch, eligible.filterNot(_ == s"$VerPrefix$upToBatch"))
    writeIntent(spark, paths, lakeRef, intent)
    Some(intent)
  }

  /** Execute (or re-execute — every step is idempotent) a recorded intent:
    * swap the staged partition in, delete the folded originals, clear the
    * marker and staging/trash dirs.
    */
  private[pipeline] def finishCompaction(
      spark: SparkSession, paths: IngestPaths, intent: CompactionIntent): Unit =
    finishCompaction(spark, paths, docLakeRef(paths), intent)

  private def finishCompaction(
      spark: SparkSession, paths: IngestPaths, lakeRef: LakeRef,
      intent: CompactionIntent): Unit = {
    val fs = lakeFs(spark, lakeRef)
    val dirName = s"$VerPrefix${intent.upTo}"
    val staged = new org.apache.hadoop.fs.Path(stageRoot(lakeRef), dirName)
    val live = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(lakeRef.lakePath), dirName)
    val trash = new org.apache.hadoop.fs.Path(trashRoot(lakeRef), dirName)
    if (fs.exists(staged)) Sinks.swapIn(fs, staged, live, trash = Some(trash))
    else Sinks.recoverSwap(fs, live, trash)
    intent.deleteDirs.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(lakeRef.lakePath), d), true)
    }
    fs.delete(intentPath(paths, lakeRef), false)
    fs.delete(stageRoot(lakeRef), true)
    fs.delete(trashRoot(lakeRef), true)
  }

  /** Finish any compaction a crash interrupted. A no-op without an intent
    * marker (an orphaned staging dir from a pre-intent crash is cleaned).
    * The ingest loop calls this on startup; ad-hoc readers of the doc lake
    * should call it after an unclean shutdown (same contract as
    * [[Sinks.recoverPartitions]]).
    */
  def recoverCompaction(spark: SparkSession, paths: IngestPaths): Unit = {
    Seq(docLakeRef(paths), embLakeRef(paths)).foreach { lakeRef =>
      readIntent(spark, paths, lakeRef) match {
        case Some(intent) => finishCompaction(spark, paths, lakeRef, intent)
        case None => lakeFs(spark, lakeRef).delete(stageRoot(lakeRef), true)
      }
    }
    // the index folds' crash windows (a swap interrupted between its two
    // renames parks the live generation dir in __old): restore on startup,
    // BEFORE any probe reads the index — a probe that misses a parked
    // generation would accept duplicates. One uniform sweep over every
    // persisted family ([[graft.functions.PersistedIndex]]); the IVF
    // handle repairs both the int8 and the PQ install (same migration-swap
    // + cell-fold windows, same layout).
    indexFamilies(paths).foreach { case (ix, p) => ix.recover(spark, p) }
  }

  /** The loop's persisted index families and their install paths — the one
    * table [[recoverCompaction]]'s sweep and [[compactIndexes]]' fold both
    * iterate (keeping repair and fold coverage in lockstep by
    * construction).
    */
  private def indexFamilies(paths: IngestPaths): Seq[(PersistedIndex, String)] = Seq(
    PersistedIndex.Fingerprint -> paths.fpIndex,
    PersistedIndex.Band -> paths.bandIndex,
    PersistedIndex.Ivf -> paths.ivfIndex,
    PersistedIndex.Ivf -> paths.ivfPqIndex,
    PersistedIndex.SpanCounts -> paths.spanIndex,
    PersistedIndex.Eval -> paths.evalIndex)

  /** Fold the append-mode INDEX state the ingest loop grows — the
    * fingerprint index's per-batch `batch=<id>` publishes
    * ([[Dedup.compactFingerprintIndex]]) and the IVF index's per-append
    * cell-list file sets ([[Similarity.compactIvfIndex]]) — on the same
    * maintenance cadence as [[compactCommitted]]. Same manifest bound, and
    * for the same reason: folding an UNCOMMITTED batch's fp generation
    * would erase the `batch=<id>` existence check that makes its
    * crash-replay publish a no-op (the replay would re-publish into a
    * generation the fold already absorbed, duplicating fps — harmless for
    * membership, but the bound keeps the invariant crisp and free).
    */
  def compactIndexes(spark: SparkSession, paths: IngestPaths, upToBatch: Long): Unit = {
    require(upToBatch <= lastApplied(spark, paths),
      s"index fold of uncommitted batches (upTo=$upToBatch > manifest=${lastApplied(spark, paths)})")
    // one fold per family via the uniform handles; the generational
    // families bound by the manifest, the IVF per-cell file fold (which
    // also maintains the PQ install's shared cell_id layout) committed-only
    // by construction. The eval index folds on human cadence, not here —
    // suites arrive rarely and its generations are few by nature.
    indexFamilies(paths)
      .filter { case (ix, _) => ix != PersistedIndex.Eval }
      .foreach { case (ix, p) => ix.compact(spark, p, upToBatch) }
  }

  /** Fold all committed `__ver ≤ upToBatch` doc-lake partitions into one.
    * Requires `upToBatch ≤ lastApplied`: compaction must never outrun the
    * manifest, or a crash-replay of an uncommitted batch would re-append
    * rows whose partition boundary no longer exists. Idempotent; safe to
    * run on any cadence from the loop that owns the lake (single-writer, as
    * [[Sinks.swapIn]]).
    */
  def compactCommitted(spark: SparkSession, paths: IngestPaths, upToBatch: Long): Unit = {
    require(upToBatch <= lastApplied(spark, paths),
      s"compaction of uncommitted batches (upTo=$upToBatch > manifest=${lastApplied(spark, paths)})")
    recoverCompaction(spark, paths)
    Seq(docLakeRef(paths), embLakeRef(paths)).foreach { lakeRef =>
      stageCompaction(spark, paths, lakeRef, upToBatch)
        .foreach(finishCompaction(spark, paths, lakeRef, _))
    }
  }

  /** Streaming entry: the same transaction driven by foreachBatch. The
    * checkpoint makes delivery at-least-once; the manifest gate upgrades the
    * composition to exactly-once (a restart replays the last uncommitted
    * batch into the same state). Any compaction a previous run's crash
    * interrupted is finished before the stream starts (the loop owns the
    * lake, so startup is the safe point). A stream carrying an `embedding`
    * column feeds the IVF growth path: each accepted doc's vector is
    * appended under `vec_id = doc id` (no-op until an index is installed).
    */
  def start(
      docs: DataFrame,
      paths: IngestPaths,
      checkpointDir: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      nearDup: Option[NearDupConfig] = None,
      semanticDedup: Option[SemanticDedupConfig] = None,
      decontam: Option[DecontamConfig] = None,
      retrievalDecontam: Option[RetrievalDecontamConfig] = None,
      spanScrub: Option[SpanScrubConfig] = None,
      maintenance: Option[MaintenanceConfig] = None,
      langGate: Option[LangGateConfig] = None,
      qualityGate: Option[QualityGateConfig] = None,
      perplexityGate: Option[PerplexityGateConfig] = None,
      cardSketch: Option[CardSketchConfig] = None): StreamingQuery = {
    recoverCompaction(docs.sparkSession, paths)
    val hasEmbedding = docs.columns.contains("embedding")
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val emb =
          if (hasEmbedding) Some(batch.select(col(idCol).as("vec_id"), col("embedding")))
          else None
        ingestBatch(batch.sparkSession, paths, batch.drop("embedding"), batchId,
          embedBatch = emb, textCol = textCol, idCol = idCol, nearDup = nearDup,
          semanticDedup = semanticDedup, decontam = decontam,
          retrievalDecontam = retrievalDecontam, spanScrub = spanScrub,
          langGate = langGate, qualityGate = qualityGate,
          perplexityGate = perplexityGate, cardSketch = cardSketch)
        // maintenance AFTER the commit: the fold reads only the manifest
        // high-water mark, so a crash between commit and fold just defers
        // the fold to a later cycle (or to startup recovery). Cadence on
        // batchId, not a counter — foreachBatch ids are stable across
        // restarts, so a replayed cycle re-runs (idempotent) rather than
        // drifting the schedule.
        maintenance.foreach { m =>
          if (batchId > 0 && batchId % m.everyNBatches.toLong == 0) {
            maintain(batch.sparkSession, paths, m.ivfHealth, m.pqHealth)
          }
        }
        ()
      }
      .start()
  }
}
