package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CCNet-style n-gram language-model perplexity filtering: train a bigram
  * LM on a reference corpus, persist it as an INTEGER log-probability
  * artifact, and score documents by mean per-transition log-probability —
  * the quality signal CCNet/LLaMA-era curation actually ranks Common
  * Crawl with (a KenLM perplexity, here an order-2 model with add-one
  * smoothing; [[QualityClassifier]] is the discriminative sibling).
  *
  * Fixed-point contract: floating point happens ONCE, at train time —
  * each probability becomes `lp_e4 = round(−10⁴·log₂ p)` (StrictMath, so
  * the artifact is platform-reproducible) and lands in the persisted
  * tables. Scoring and the DuckDB oracle both consume the SAME integer
  * tables (the q100 shared-artifact discipline), so no engine ever
  * recomputes a logarithm and scores replay bit-identically.
  *
  * Model artifact layout at `path`:
  *   - `bigrams/`  (w1, w2, lp_e4): observed transitions,
  *     p = (c(w1,w2)+1)/(c(w1)+V)
  *   - `unigrams/` (w1, miss_lp_e4): the smoothed floor for an UNSEEN
  *     transition out of a known w1, p = 1/(c(w1)+V)
  *   - `defaults/` (lp0_e4): the global floor for an unknown w1,
  *     p = 1/V — one row, so every scoring constant comes from the
  *     artifact, never from code
  *   - `_GRAFT_LAYOUT` (v=<vocab>,lm=<version>): the smoothing
  *     denominator travels with the model ([[IndexProtocol]] contract)
  *
  * Scale shape: training is two hash aggregations over exploded
  * transitions (narrow (w1, w2) rows, one shuffle each); scoring joins
  * the batch's transitions against the bigram table — broadcast when the
  * model is small, an ordinary equi-join keyed on (w1, w2) when a 100 TB
  * reference corpus makes it big — followed by one per-doc aggregation.
  * Nothing driver-side at any size.
  */
object LangModel {

  /** Scheme version — a stamp ingredient for persisted model fixtures. */
  val LmVersion = 1

  private def lpE4(p: Double): Long =
    Math.round(-10000.0 * Math.log(p) / Math.log(2.0))

  /** Column form of [[lpE4]] over a probability ratio num/den — built-in
    * log2 + half-up round, so quantization stays inside codegen (no UDF).
    * The artifact persists the RESULT, so every consumer — scoring,
    * replays, the oracle — reads identical integers regardless of where
    * the model was trained.
    */
  private def lpE4Col(num: Column, den: Column): Column =
    round(lit(-10000.0) * log2(num / den)).cast("long")

  /** Adjacent token transitions of a text column: (w1, w2) per consecutive
    * pair under the engine-wide single-space tokenizer. With
    * `padShortDocs`, a document with fewer than two tokens emits ONE
    * all-null row instead of none — the scoring aggregation counts only
    * non-null transitions, so short docs surface as (0, 0) WITHOUT a
    * join-back against the corpus (which planned as a second doc_id
    * exchange + sort-merge join — plan-audit finding).
    */
  private def transitions(
      docs: DataFrame, textCol: String, idCol: String,
      padShortDocs: Boolean = false): DataFrame = {
    val t = Text.tokens(col(textCol))
    val pairs = arrays_zip(
      slice(t, lit(1), greatest(size(t) - 1, lit(0))).as("w1"),
      slice(t, lit(2), greatest(size(t) - 1, lit(0))).as("w2"))
    val nullPad = array(struct(
      lit(null).cast("string").as("w1"), lit(null).cast("string").as("w2")))
    val src = if (padShortDocs)
      when(size(pairs) > 0, pairs).otherwise(nullPad) else pairs
    docs
      .select(col(idCol), explode(src).as("__tr"))
      .select(col(idCol),
        col("__tr").getField("w1").as("w1"),
        col("__tr").getField("w2").as("w2"))
  }

  /** Train and persist a bigram model from a reference corpus. One pass:
    * transitions exploded once, counted per (w1, w2) and per w1; log-probs
    * quantized to e4 integers and written as the three artifact tables.
    */
  def train(docs: DataFrame, textCol: String, path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tr = transitions(
        docs.withColumn("__lm_id", lit(0L)), textCol, "__lm_id")
      .select("w1", "w2")
    val big = tr.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .localCheckpoint(false) // feeds both the bigram table and the w1 margins
    val uni = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
    // vocab = distinct tokens seen in ANY transition position — one exact
    // distinct count, never collected
    val vocab = tr.select(explode(array(col("w1"), col("w2"))).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    val V = math.max(vocab, 1L)
    big.join(uni, "w1")
      .select(col("w1"), col("w2"),
        lpE4Col(col("c12") + 1, col("c1") + V).as("lp_e4"))
      .write.mode("overwrite").parquet(s"$path/bigrams")
    uni
      .select(col("w1"), lpE4Col(lit(1), col("c1") + V).as("miss_lp_e4"))
      .write.mode("overwrite").parquet(s"$path/unigrams")
    Seq(lpE4(1.0 / V.toDouble)).toDF("lp0_e4")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/defaults")
    IndexProtocol.writeLayoutPayload(spark, path, s"v=$V,lm=$LmVersion")
  }

  /** The model's recorded vocabulary size (smoothing denominator). */
  def readVocabSize(spark: SparkSession, path: String): Long = {
    val payload = IndexProtocol.readLayoutPayload(spark, path)
    val m = "v=(\\d+),lm=(\\d+)".r.findFirstMatchIn(payload).getOrElse(
      throw new IllegalStateException(s"malformed LM layout at $path: $payload"))
    require(m.group(2).toInt == LmVersion,
      s"LM at $path is scheme v${m.group(2)}, this build scores v$LmVersion — retrain")
    m.group(1).toLong
  }

  // ------------------------------------------------- incremental counts

  /** The incremental flavor (q108): transition-count FACTS live as a
    * generational persisted index — `counts/batch=<gen>` directories of
    * (w1, w2, src, c) rows under the [[IndexProtocol]] crash protocol,
    * exactly the span-count index's shape — and the SERVED artifact (the
    * `model/` tables [[scoreDocs]] reads) is re-derived from the
    * accumulated facts on maintenance cadence via a staged swap. A
    * training corpus that grows by ingest batches then pays one O(batch)
    * count pass per batch, not an O(corpus) retrain: counts are the
    * sufficient statistics of this model, so refresh-from-facts is
    * EXACTLY a full retrain (`LangModelSpec` pins the two byte-equal).
    *
    * Crash windows, by construction: appends are atomic generation
    * publishes (replay no-ops); the refresh reads `distinct` facts (a
    * fold's post-swap duplicate generations sum once — the span-index
    * argument verbatim) and swaps the model in whole; scoring between
    * refreshes sees the previous model, which is the frozen-artifact
    * contract the ingest gate already requires.
    */
  private def countsRoot(path: String) = s"$path/counts"

  /** Served-model root under an incremental install — pass to
    * [[scoreDocs]]/[[readVocabSize]]. */
  def modelRoot(path: String): String = s"$path/model"

  private def countFacts(
      docs: DataFrame, textCol: String, generation: Long): DataFrame =
    transitions(docs.withColumn("__lm_id", lit(0L)), textCol, "__lm_id")
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .select(col("w1"), col("w2"), lit(generation).as("src"), col("c"))

  /** Install a count index from a history corpus (generation 0) and
    * derive the first served model. */
  def installCountIndex(
      history: DataFrame, textCol: String, path: String): Unit = {
    val spark = history.sparkSession
    val fs = IndexProtocol.fileSystem(spark, path)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path))
    IndexProtocol.writeLayoutPayload(spark, path, s"lm=$LmVersion")
    graft.sinks.Sinks.publishDir(
      countFacts(history, textCol, generation = 0L), countsRoot(path), "batch=0")
    refreshModel(spark, path)
  }

  /** Publish one batch's transition counts as its own immutable
    * generation. Returns false for an already-published generation
    * (replay no-op), like every generational append. */
  def appendCounts(
      batch: DataFrame, path: String, generation: Long,
      textCol: String = "text"): Boolean = {
    val payload = IndexProtocol.readLayoutPayload(batch.sparkSession, path)
    require(payload == s"lm=$LmVersion",
      s"LM count index at $path is '$payload', this build writes lm=$LmVersion — rebuild")
    graft.sinks.Sinks.publishDir(
      countFacts(batch, textCol, generation), countsRoot(path), s"batch=$generation")
  }

  def countIndexReadable(spark: SparkSession, path: String): Boolean =
    IndexProtocol.generationalReadable(spark, path, Seq("counts"))

  /** Fold count generations ≤ upToGen into one (membership-fact argument:
    * rows are (w1, w2, src, c) facts, duplicates from a crashed fold sum
    * once through the refresh's distinct). */
  def compactCountIndex(spark: SparkSession, path: String, upToGen: Long): Unit =
    IndexProtocol.compactGenerational(spark, countsRoot(path), upToGen)

  /** Re-derive the served model from the accumulated facts and swap it
    * in. Identical arithmetic to [[train]] — same smoothing, same
    * quantization — over summed counts, so an install+appends+refresh
    * equals a full retrain on the union corpus. */
  def refreshModel(spark: SparkSession, path: String): Unit = {
    if (!countIndexReadable(spark, path)) return
    val big = spark.read.parquet(countsRoot(path))
      .select("w1", "w2", "src", "c").distinct()
      .groupBy("w1", "w2").agg(sum(col("c")).as("c12"))
      .localCheckpoint(false)
    val uni = big.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = big.select(explode(array(col("w1"), col("w2"))).as("w"))
      .agg(countDistinct(col("w"))).head().getLong(0)
    val V = math.max(vocab, 1L)
    IndexProtocol.stagedReplace(spark, modelRoot(path)) { next =>
      import spark.implicits._
      big.join(uni, "w1")
        .select(col("w1"), col("w2"),
          lpE4Col(col("c12") + 1, col("c1") + V).as("lp_e4"))
        .write.mode("overwrite").parquet(s"$next/bigrams")
      uni
        .select(col("w1"), lpE4Col(lit(1), col("c1") + V).as("miss_lp_e4"))
        .write.mode("overwrite").parquet(s"$next/unigrams")
      Seq(lpE4(1.0 / V.toDouble)).toDF("lp0_e4")
        .coalesce(1).write.mode("overwrite").parquet(s"$next/defaults")
      IndexProtocol.writeLayoutPayload(spark, next, s"v=$V,lm=$LmVersion")
    }
  }

  /** Score documents against a persisted model: per doc, the number of
    * transitions and the mean per-transition log₂-probability in e4 units
    * (half-up — [[ExactAgg.divHalfUp]], mirrored in the oracle). Lower is
    * more fluent under the reference corpus; `ppl_e4 = 0` with
    * `n_transitions = 0` for sub-2-token docs (nothing to score, kept
    * rather than crashed — the caller's ladder decides their fate).
    * Transition log-probs resolve bigram-hit → known-w1 floor → global
    * floor, every value read from the artifact.
    */
  def scoreDocs(
      docs: DataFrame, textCol: String, idCol: String, path: String): DataFrame = {
    val spark = docs.sparkSession
    readVocabSize(spark, path) // version check up front
    val bigrams = spark.read.parquet(s"$path/bigrams")
    val unigrams = spark.read.parquet(s"$path/unigrams")
    val lp0 = spark.read.parquet(s"$path/defaults").head().getLong(0)
    // short docs ride the SAME explode as a null pad, so one aggregation
    // keyed on the doc id is the whole plan — scan → explode → two
    // BROADCAST model joins → partial agg → one id exchange → final agg
    // (no corpus join-back; plan-asserted in PlanAuditSpec)
    transitions(docs, textCol, idCol, padShortDocs = true)
      .join(broadcast(bigrams), Seq("w1", "w2"), "left")
      .join(broadcast(unigrams), Seq("w1"), "left")
      .select(col(idCol),
        col("w1"),
        when(col("w1").isNotNull,
          coalesce(col("lp_e4"), col("miss_lp_e4"), lit(lp0))).as("__lp"))
      .groupBy(idCol)
      .agg(count(col("w1")).as("n_transitions"), sum(col("__lp")).as("__lp_sum"))
      .select(col(idCol),
        col("n_transitions"),
        when(col("n_transitions") === 0, lit(0L))
          .otherwise(ExactAgg.divHalfUp(col("__lp_sum"), col("n_transitions")))
          .as("ppl_e4"))
  }
}
