package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Classify, Cleaning, Features, Temporal}

/** The reference's batch clean→enrich pipeline
  * (reference: bigdata-project/src/spark_batch_v2.py:49-208) re-expressed on
  * the driver's `events` table, exercising every scalar-op family once:
  * JSON decode (S4), validation filter (P2), canonicalization (F7), regex
  * taxonomy (F5), threshold bucketing (M4), region ladder (M8), calendar
  * extracts (D4), guarded ratio (M5), boolean flag (M6), doc-id synthesis
  * (F8).
  *
  * Every derivation is a codegen'd Column expression on the scan projection —
  * one narrow stage, no shuffle until an aggregate consumes it.
  */
object EventsPipeline {

  val categoryRules: Seq[Classify.Rule] = Seq(
    Classify.Rule("click|view", "Engagement"),
    Classify.Rule("purchase", "Commerce"),
    Classify.Rule("signup", "Acquisition"),
    Classify.Rule("error", "Reliability"))

  /** value → tier ladder (M4 analog of salary buckets). */
  val valueTiers: Seq[(Double, String)] =
    Seq(30.0 -> "T1_LOW", 60.0 -> "T2_MID", 100.0 -> "T3_HIGH")

  def enrich(events: DataFrame): DataFrame = {
    val valid = Cleaning.validRows(events, requiredString = Seq("event_type"), requiredAny = Seq("event_id"))
    valid
      // S4: JSON decode of the props payload against a known path.
      // try_cast: a plain cast THROWS under Spark 4's default ANSI mode on
      // any non-integer k ("abc", "12.5"), killing the batch job and
      // crash-looping the streaming query on one poison record — the
      // module contract is degrade-to-null (review finding)
      .withColumn("k", get_json_object(col("props"), "$.k").try_cast("int"))
      // F7: canonical dimension string.
      .withColumn("event_type_clean", Cleaning.canonical(col("event_type")))
      // F5: regex taxonomy, first-match-wins.
      .withColumn("category", Classify.byRegex(col("event_type"), categoryRules, "Other"))
      // M4: threshold bucketing.
      .withColumn("value_tier", Classify.byThreshold(col("value"), valueTiers, "T4_TOP", "T0_UNKNOWN"))
      // M8: region ladder over a deterministic shard of user_id.
      .withColumn(
        "region",
        when(col("user_id") % 3 === 0, "North America")
          .when(col("user_id") % 3 === 1, "Europe")
          .otherwise("Other"))
      // D4: calendar extracts (Sunday=0 convention, Temporal.dayOfWeekSun0).
      .withColumn("dow", Temporal.dayOfWeekSun0(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("quarter", quarter(col("ts")))
      // M5: guarded ratio feature.
      .withColumn("score", Features.guardedRatio(col("value"), col("k")))
      // M6: boolean demand flag.
      .withColumn("is_high_value", col("value") > 100 && col("k") < 50)
      // F8: synthesized upsert key for keyed sinks.
      .withColumn("doc_id", concat_ws("_", col("event_type_clean"), col("event_id")))
  }
}
