package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession factory with the engine's scale defaults:
  * everything here is exactly what you'd set on a 1000-executor cluster,
  * minus cluster-manager specifics.
  */
object GraftSession {

  /** RocksDB-backed streaming state (bundled with Spark — rocksdbjni ships
    * in the distribution). The scale option for stateful streaming: state
    * lives off-heap/on-disk per executor instead of in the JVM heap, so
    * watermark-bounded-but-large state (millions of open session windows)
    * stops competing with execution memory. Settable per session at
    * runtime: `spark.conf.set(StateStoreProviderKey, RocksDbProvider)`
    * before starting the query, or pass `rocksDbStateStore = true` here.
    */
  val StateStoreProviderKey = "spark.sql.streaming.stateStore.providerClass"
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** @param shufflePartitions ≈ 2-3× total executor cores in production;
    *                          ≈ local cores for local runs.
    * @param rocksDbStateStore back streaming state with RocksDB instead of
    *                          the default in-heap HDFS-backed store.
    */
  def builder(
      appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors(),
      rocksDbStateStore: Boolean = false): SparkSession.Builder = {
    val b = semanticDefaults(SparkSession.builder().appName(appName))
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    val b2 = if (rocksDbStateStore) b.config(StateStoreProviderKey, RocksDbProvider) else b
    master.fold(b2)(b2.master)
  }

  /** Deployment flavor ([[graft.Submit]]): ONLY the engine's semantic
    * defaults — no master, no shuffle-partition override — because builder
    * `.config` outranks a `--properties-file`/`--conf`, and cluster shape
    * (master URL, partitions ≈ 2-3× total cores, executor sizing) must
    * stay with the submit conf where ops owns it.
    */
  def deployBuilder(appName: String): SparkSession.Builder =
    semanticDefaults(SparkSession.builder().appName(appName))

  /** Forward-compat sweep gate (round-10 verdict #5): `SPARK_GRAFT_ANSI=true`
    * flips every graft session to ANSI mode so the whole registry + pipeline
    * surface can be certified against Spark's strict-SQL future in ONE pass
    * instead of finding ANSI poison pills (bad casts, overflow, malformed
    * timestamps) one per round. Not the default: the engine's published
    * semantics are the non-ANSI ones the oracles pin.
    */
  private[graft] def ansiSweep: Boolean =
    sys.env.get("SPARK_GRAFT_ANSI") match {
      case None => false
      case Some(v) if v.equalsIgnoreCase("true") => true
      case Some(v) if v.equalsIgnoreCase("false") || v.isEmpty => false
      // strict like Submit.boolOpt: SPARK_GRAFT_ANSI=1 silently running the
      // PERMISSIVE suite would certify an ANSI sweep that never happened —
      // the silent-boolean failure mode, applied to the CI gate itself
      case Some(other) => sys.error(
        s"SPARK_GRAFT_ANSI must be true or false, got '$other'")
    }

  private def semanticDefaults(b: SparkSession.Builder): SparkSession.Builder =
    (if (ansiSweep) b.config("spark.sql.ansi.enabled", "true") else b)
      // deterministic timestamps across engines and sites
      .config("spark.sql.session.timeZone", "UTC")
      // AQE: runtime shuffle coalescing + skew-join splitting — the safety
      // net for skewed keys at scale
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // the JVM-wide generated-class cache defaults to 100 entries — far
      // under this engine's query surface. Measured (PLANS.md r16): at 126
      // registry queries the LRU thrashes, every suite pass re-janinos
      // classes the previous pass compiled, and the cost grows with every
      // query added (q90 crept 2.9→4.0 s over three rounds with its code
      // and plan untouched; at 2000 entries it returns to 2.1 s and the
      // whole suite drops ~15%). Static conf: takes effect at the JVM's
      // first session — exactly what a large-surface production deployment
      // sets in spark-defaults.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // NOT set here: spark.sql.legacy.parquet.nanosAsLong. It would
      // silently change how EVERY parquet read in the session handles
      // TIMESTAMP(NANOS) columns (longs instead of a loud failure) —
      // including production deploy sessions. Tables.events opts in
      // adaptively, only when the events file actually declares NANOS
      // (review finding; see Tables.scala).
      // wide-aggregate plans (the 128-permutation MinHash signature) must
      // stay inside WholeStageCodegen; the default cap of 100 fields
      // silently drops them to interpreted evaluation (measured 2.3×)
      .config("spark.sql.codegen.maxFields", "256")
      // native functions (cosine_sim) available in SQL
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
}
