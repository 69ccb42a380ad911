package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Feature-engineering operators (SURVEY §2.5 M5/M6 + §2.6 A8). */
object Features {

  /** Ratio×100 with zero-guard (M5, competition_score,
    * reference: bigdata-project/src/spark_batch_v2.py:191-195).
    */
  def guardedRatio(numer: Column, denom: Column): Column =
    when(denom > 0 && numer > 0, numer.cast("double") / denom * 100.0).otherwise(0.0)

  /** Boolean demand flag (M6, reference: bigdata-project/src/spark_batch_v2.py:198-201). */
  def highDemand(views: Column, score: Column, viewsMin: Double, scoreMax: Double): Column =
    views > viewsMin && score < scoreMax

  /** Global-mean imputation (A8, reference:
    * demo/src/main/java/com/example/demo/service/JobService.java:70-110,
    * minus the random jitter — deterministic by design, SURVEY §7.4).
    *
    * Scale note: the global mean is a 1-row aggregate crossJoin-broadcast to
    * every row — no shuffle of the fact table, no driver collect; the plan is
    * scan → partial agg → broadcast nested loop join, which is exactly what a
    * 1000-executor cluster wants for scalar imputation.
    */
  def imputeWithGlobalMean(df: DataFrame, valueCol: String, filledName: String): DataFrame = {
    val mean = df.agg(avg(col(valueCol)).as("__mean"))
    df.crossJoin(broadcast(mean))
      .withColumn(filledName, coalesce(col(valueCol), col("__mean")))
      .drop("__mean")
  }

  /** Jittered global-mean imputation — A8 to the letter: missing values are
    * filled with `global_mean × U(0.8, 1.2)` exactly as the reference does
    * (reference: demo/src/main/java/com/example/demo/service/JobService.java:70-86),
    * but with the randomness SEEDED so a given (seed, row order) is
    * reproducible run to run: `mean × (0.8 + 0.4·rand(seed))`.
    *
    * Same broadcast-scalar plan shape as [[imputeWithGlobalMean]].
    * Determinism caveat (why this variant is not oracle-gated): `rand(seed)`
    * is seeded PER PARTITION, so values are stable only for a fixed
    * partitioning — a repartitioned input draws a different (still seeded)
    * jitter stream. The deterministic variant stays the default for
    * pipelines that need layout-independent outputs.
    */
  def imputeWithJitter(
      df: DataFrame,
      valueCol: String,
      filledName: String,
      seed: Long): DataFrame = {
    val mean = df.agg(avg(col(valueCol)).as("__mean"))
    df.crossJoin(broadcast(mean))
      .withColumn(
        filledName,
        coalesce(col(valueCol), col("__mean") * (lit(0.8) + lit(0.4) * rand(seed))))
      .drop("__mean")
  }
}
