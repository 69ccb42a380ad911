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
}
