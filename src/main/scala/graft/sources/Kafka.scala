package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter}

/** Kafka source/sink configuration boundary (S2/S8).
  *
  * The reference consumes one topic with earliest offsets and produces the
  * enriched stream back to Kafka (reference:
  * bigdata-project/src/spark_streaming_v2.py:57-63,
  * kafka_to_minio.py:34-41). This module owns the translation from typed
  * config to the connector's option surface; everything downstream of the
  * loaded frame is source-agnostic (`StreamPipeline.fromKafka` projects the
  * binary `value` and the rest never sees Kafka).
  *
  * Connector-jar-gated: `format("kafka")` resolves only when
  * `spark-sql-kafka-0-10` is on the classpath (not shippable in this
  * offline harness — `load()`/`start()` here would throw
  * DATA_SOURCE_NOT_FOUND). The option-building logic is what this module
  * tests; tests cover it without a broker.
  */
object Kafka {

  /** @param maxOffsetsPerTrigger back-pressure cap — REQUIRED at scale: an
    *                             uncapped first batch after downtime reads
    *                             the whole retention window into one
    *                             micro-batch.
    */
  case class KafkaSourceConfig(
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true,
      extra: Map[String, String] = Map.empty) {

    require(topics.nonEmpty, "at least one topic")

    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "subscribe" -> topics.mkString(","),
        "startingOffsets" -> startingOffsets,
        "failOnDataLoss" -> failOnDataLoss.toString) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
        extra

    def reader(spark: SparkSession): DataStreamReader =
      spark.readStream.format("kafka").options(options)

    /** Jar-gated: requires the Kafka connector on the classpath. */
    def load(spark: SparkSession): DataFrame = reader(spark).load()
  }

  case class KafkaSinkConfig(
      bootstrapServers: String,
      topic: String,
      checkpoint: String,
      extra: Map[String, String] = Map.empty) {

    def options: Map[String, String] =
      Map(
        "kafka.bootstrap.servers" -> bootstrapServers,
        "topic" -> topic,
        "checkpointLocation" -> checkpoint) ++ extra

    /** The producer contract: a `value` column (and optional `key`). */
    def writer(df: DataFrame): DataStreamWriter[Row] =
      df.writeStream.format("kafka").options(options)
  }
}
