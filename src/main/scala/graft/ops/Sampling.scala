package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Deterministic, content-stable sampling and dataset splitting for
  * training-data pipelines.
  *
  * Assignment is a pure function of the KEY (md5-derived 60-bit hash mod
  * 100), so it is stable across runs, engines, cluster sizes and data
  * layout — unlike `randomSplit`/`sample`, whose assignment depends on
  * partitioning and seed plumbing. A document keeps its split forever even
  * as the corpus around it grows, which is what prevents train/test
  * contamination across dataset versions.
  */
object Sampling {

  /** The hash input for a (key, salt) pair. The empty salt hashes the BARE
    * key — the module's original (oracle-pinned) assignment; a non-empty
    * salt namespaces the hash so INDEPENDENT decisions decorrelate.
    *
    * Why salts exist (review finding): every assignment here is a pure
    * function of the key, so two UNSALTED decisions on the same key are
    * perfectly correlated — `sampleByHash(df, id, 10)` keeps exactly
    * buckets 0-9, and a subsequent unsalted `splitLabel` (trainPct=80)
    * labels all of them 'train': the val/test splits are silently EMPTY.
    * Pass a distinct salt per independent decision ("sample-v1",
    * "split-v1") to compose them; keep the default only when a single
    * decision is made per key, or when correlation is the point (nested
    * samples: a row kept at 5% stays kept at 10%).
    */
  private def salted(key: Column, salt: String): Column =
    if (salt.isEmpty) key.cast("string")
    else concat(key.cast("string"), lit("#" + salt))

  /** Percent bucket 0-99 for a key (null key → null; see [[splitLabel]] /
    * [[sampleByHash]] for the two consumers' null policies).
    */
  def hashBucket(key: Column, salt: String = ""): Column =
    pmod(Dedup.tokenHash64(salted(key, salt)), lit(100L))

  /** 'train' / 'val' / 'test' assignment by hash bucket.
    *
    * Null keys are assigned to 'train' EXPLICITLY: a null bucket would
    * fall through every `when` into the `otherwise` branch, silently
    * concentrating all null-key documents (i.e. whatever upstream
    * pathology produced them) in the TEST split — the one place they
    * must never land. Train is the conservative side for bad rows.
    */
  def splitLabel(key: Column, trainPct: Int = 80, valPct: Int = 10, salt: String = ""): Column = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = hashBucket(key, salt)
    when(key.isNull, "train")
      .when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic ~pct% sample: rows whose key bucket falls below pct.
    * Null keys are DROPPED (a null bucket fails the filter) — an
    * unsampleable row is excluded rather than always/never kept; contrast
    * [[splitLabel]], where every row must receive a label.
    */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int, salt: String = ""): DataFrame =
    df.filter(hashBucket(col(keyCol), salt) < pct)

  /** Deterministic FIXED-SIZE per-stratum sample — the exact-count sibling
    * of [[sampleByStratum]] (rates give expected sizes; eval-set carving
    * needs "exactly n docs per language"): rank each stratum's rows by the
    * salted key hash (then by key, a total order) and keep the first `n`.
    * The classic tool here is reservoir sampling, but a reservoir is
    * RNG-dependent — a replay or a different partitioning draws a
    * different sample; hash-rank order is a pure function of the keys, so
    * the same corpus always yields the same sample (content-stable like
    * every decision in this module) and the oracle reproduces it exactly.
    *
    * One shuffle on the stratum (partial ranking is not map-side prunable
    * for exact top-n per group, but WindowGroupLimit caps what each
    * partition forwards). NULL keys are DROPPED (the [[sampleByHash]]
    * policy: an unsampleable row is excluded, never always-kept).
    * Duplicate keys within a stratum tie completely; keys are expected
    * unique per row (the dedupByKey determinism contract).
    */
  def takePerStratum(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      n: Int,
      salt: String = ""): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(Dedup.tokenHash64(salted(col(keyCol), salt)), col(keyCol))
    df.filter(col(keyCol).isNotNull)
      .withColumn("__graft_rk", row_number().over(w))
      .filter(col("__graft_rk") <= n)
      .drop("__graft_rk")
  }

  /** Basis-point bucket 0-9999 for a key — the finer-grained sibling of
    * [[hashBucket]] for per-stratum sampling rates below 1%.
    */
  def hashBucketE4(key: Column, salt: String = ""): Column =
    pmod(Dedup.tokenHash64(salted(key, salt)), lit(10000L))

  /** Deterministic weighted stratified sampling — the corpus-mixing
    * primitive of a training-data pipeline ("2× wikipedia, 0.3× common
    * crawl, 1× code"): each stratum value keeps rows at its own rate
    * (basis points, 10000 = keep all; strata absent from the map keep
    * `defaultE4`). Assignment is the same pure key-hash as [[splitLabel]]:
    * stable across runs, engines, partitioning and corpus growth, and a
    * row kept at rate r stays kept at any rate ≥ r (nested samples — rate
    * changes only add or remove the delta, they never reshuffle the
    * sample).
    *
    * Plan shape: a per-row codegen'd predicate inside the scan — no
    * shuffle, no sort, no state. `sample`/`randomSplit` give none of these
    * guarantees (partitioning-dependent seeds).
    */
  def sampleByStratum(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      ratesE4: Map[String, Int],
      defaultE4: Int = 10000,
      salt: String = ""): DataFrame = {
    require((ratesE4.values ++ Seq(defaultE4)).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    val rate = ratesE4.toSeq.sortBy(_._1).foldRight(lit(defaultE4): Column) {
      case ((stratum, r), acc) => when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashBucketE4(col(keyCol), salt) < rate)
  }

  /** Deterministic WITH-REPLACEMENT upsampling — epoch mixing's other
    * half (round-13 verdict #4): real training mixtures run high-quality
    * sources for MORE than one epoch ("2.3 epochs of wikipedia"), which
    * [[sampleByStratum]]'s keep/drop rates (≤ 1.0) cannot express. Rates
    * are basis points and may exceed 10000: every row emits
    * `floor(rate/10000)` full replicas, plus one more when its
    * PER-REPLICA salted hash clears the fractional remainder — the hash
    * input is `key#salt#rep<i>`, so the draw is content-stable (the
    * q49/q56 discipline: same corpus → same replicas, on any engine,
    * any partitioning, any replay) and MONOTONE in the rate: raising a
    * stratum's rate only adds replicas, it never reshuffles the ones
    * already drawn (full replicas are unconditional; the fractional
    * replica at index `floor(rate/10000)` keeps a superset of keys as
    * the remainder grows, and a rate crossing a whole epoch freezes that
    * replica in unconditionally).
    *
    * Output carries a 0-based `replica` column so downstream keys stay
    * unique — (key, replica) is the row identity an epoch-mixed shard
    * writer feeds to [[trainingOrder]] (salt the order per epoch and the
    * replicas decorrelate in the shuffle). NULL keys are DROPPED (the
    * [[sampleByHash]] policy); a NULL stratum takes `defaultE4`.
    *
    * Plan shape: one `explode(sequence(...))` + a per-row codegen'd
    * predicate — no shuffle, no state, output size `Σ ceil(rate_s)·|s|`
    * by construction. The classic alternative (union of N copies +
    * a sampled tail) plans N scans; this is one.
    */
  def upsampleByStratum(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      ratesE4: Map[String, Int],
      defaultE4: Int = 10000,
      salt: String = ""): DataFrame = {
    require((ratesE4.values ++ Seq(defaultE4)).forall(r => r >= 0 && r <= 1000000),
      "rates are basis points in [0, 1000000] (100 epochs — a sanity ceiling)")
    val rate = ratesE4.toSeq.sortBy(_._1).foldRight(lit(defaultE4): Column) {
      case ((stratum, r), acc) => when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    val nFull = floor(rate.cast("long") / lit(10000L)).cast("int")
    val frac = pmod(rate.cast("long"), lit(10000L))
    val keep = col("replica") < nFull ||
      pmod(
        Dedup.tokenHash64(concat(
          salted(col(keyCol), salt), lit("#rep"), col("replica").cast("string"))),
        lit(10000L)) < frac
    df.filter(col(keyCol).isNotNull)
      .withColumn("replica", explode(sequence(lit(0), nFull)))
      .filter(keep)
      .withColumn("replica", col("replica").cast("long"))
  }

  /** Train→eval leakage detector (decontamination): for every val/test
    * document that shares at least one winnowing fingerprint
    * ([[graft.functions.Text.winnowFingerprints]] — i.e. a verbatim run of
    * ≥ w+k−1 tokens) with the train split, report how many distinct train
    * documents it collides with and through how many of its fingerprints.
    * Run before training; drop or re-split the reported docs.
    *
    * Scale shape: fingerprints are (id, fp) long pairs; the
    * train-vs-eval collision join shuffles only those pairs on the 64-bit
    * fp key — document text never moves. Both aggregates are two-phase
    * with map-side combine. Splits come from [[splitLabel]] so the report
    * is consistent with the pipeline's own split assignment.
    */
  def contaminationReport(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    // salted winnowing (identical fingerprint set, spec-pinned): the plain
    // variant serializes each document's window on one task, the hot-key
    // hazard one pathological 10^8-token document turns into a stage
    // stall — every other winnowing consumer already uses the salted form.
    // localCheckpoint: fps feeds BOTH join sides (train + eval), and
    // without the pin the whole tokenize→explode→hash→window pipeline —
    // the dominant cost — evaluates twice (review finding).
    val fps = graft.functions.Text.winnowFingerprintsSalted(docs, textCol, idCol)
      .withColumn("split", splitLabel(col(idCol), trainPct, valPct))
      .localCheckpoint(false)
    val train = fps.filter(col("split") === "train")
      .select(col("fp"), col(idCol).as("__train_id"))
    fps.filter(col("split") =!= "train")
      .join(train, Seq("fp"))
      .groupBy(col(idCol), col("split"))
      .agg(
        countDistinct(col("__train_id")).as("n_train_docs"),
        countDistinct(col("fp")).as("n_shared_fps"))
  }

  /** Deterministic global training order — the final-mile shuffle a shard
    * writer iterates in: every epoch's data order must be pseudo-random
    * (adjacent corpus docs decorrelated) yet REPRODUCIBLE (a re-run, a
    * resumed job, or a differently-sized cluster must emit byte-identical
    * shards). `ORDER BY hash(key # salt)` gives both: the salted 60-bit
    * key hash is a pure function of the row key, a new salt ("epoch1") is
    * a fresh permutation, and the total sort is Spark's range exchange —
    * the one shuffle the operation inherently is. The shard assignment
    * comes from the HASH, not the sorted position (a position-based shard
    * would need a global row count barrier; the hash shard is map-side
    * and equally balanced). Null keys are DROPPED ([[sampleByHash]]'s
    * policy: an unorderable row is excluded, never pinned to an end).
    */
  def trainingOrder(
      df: DataFrame,
      keyCol: String,
      shards: Int,
      salt: String = ""): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    df.filter(col(keyCol).isNotNull)
      .withColumn("shuffle_key", Dedup.tokenHash64(salted(col(keyCol), salt)))
      .withColumn("shard", pmod(col("shuffle_key"), lit(shards.toLong)))
      .orderBy(col("shuffle_key"), col(keyCol))
  }

  /** SemDeDup-style cluster-balanced carve (the q62/q96 composition): draw
    * a fixed-size, content-stable sample PER SEMANTIC CELL of a persisted
    * IVF index — "n vectors from every k-means cluster" — so the carve is
    * diversity-balanced rather than frequency-weighted (a frequency-
    * proportional sample of a web corpus is mostly its dominant modes;
    * SemDeDup's observation is that balanced per-cluster draws cover the
    * embedding space). The cell assignment comes from the index's
    * inverted-list layout ([[graft.functions.Similarity.writeIvfIndex]]),
    * NOT recomputed — the persisted artifact is the shared source of
    * truth, which is also what makes the carve exactly re-derivable by
    * any engine that can read the lists. Scale shape: one scan of the
    * (vec_id, cell_id) lists — vectors themselves never load — and the
    * q96 WindowGroupLimit carve on the cell stratum.
    */
  def semanticCarve(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      n: Int,
      salt: String = ""): DataFrame = {
    val lists = graft.sources.Tables.parquetScan(spark, s"$indexPath/lists")
      .select(col("cell_id").cast("long").as("cell_id"), col("vec_id"))
    takePerStratum(lists, "vec_id", "cell_id", n, salt)
  }
}
