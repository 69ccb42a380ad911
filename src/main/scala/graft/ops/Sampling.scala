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

  /** Percent bucket 0-99 for a key. */
  def hashBucket(key: Column): Column =
    pmod(Dedup.tokenHash64(key.cast("string")), lit(100L))

  /** 'train' / 'val' / 'test' assignment by hash bucket. */
  def splitLabel(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val b = hashBucket(key)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic ~pct% sample: rows whose key bucket falls below pct. */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol)) < pct)

  /** Basis-point bucket 0-9999 for a key — the finer-grained sibling of
    * [[hashBucket]] for per-stratum sampling rates below 1%.
    */
  def hashBucketE4(key: Column): Column =
    pmod(Dedup.tokenHash64(key.cast("string")), lit(10000L))

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
      defaultE4: Int = 10000): DataFrame = {
    require((ratesE4.values ++ Seq(defaultE4)).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0, 10000]")
    val rate = ratesE4.toSeq.sortBy(_._1).foldRight(lit(defaultE4): Column) {
      case ((stratum, r), acc) => when(col(stratumCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(hashBucketE4(col(keyCol)) < rate)
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
    val fps = graft.functions.Text.winnowFingerprints(docs, textCol, idCol)
      .withColumn("split", splitLabel(col(idCol), trainPct, valPct))
    val train = fps.filter(col("split") === "train")
      .select(col("fp"), col(idCol).as("__train_id"))
    fps.filter(col("split") =!= "train")
      .join(train, Seq("fp"))
      .groupBy(col(idCol), col("split"))
      .agg(
        countDistinct(col("__train_id")).as("n_train_docs"),
        countDistinct(col("fp")).as("n_shared_fps"))
  }
}
