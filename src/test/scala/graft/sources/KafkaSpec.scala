package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class KafkaSpec extends AnyFunSuite {

  test("source config builds the connector option surface") {
    val cfg = Kafka.KafkaSourceConfig(
      bootstrapServers = "broker1:9092,broker2:9092",
      topics = Seq("events", "jobs"),
      startingOffsets = "earliest",
      maxOffsetsPerTrigger = Some(50000L),
      failOnDataLoss = false,
      extra = Map("kafka.security.protocol" -> "SASL_SSL"))
    assert(cfg.options == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "events,jobs",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false",
      "maxOffsetsPerTrigger" -> "50000",
      "kafka.security.protocol" -> "SASL_SSL"))
  }

  test("source config defaults: latest offsets, fail on data loss, no cap") {
    val opts = Kafka.KafkaSourceConfig("b:9092", Seq("t")).options
    assert(opts("startingOffsets") == "latest")
    assert(opts("failOnDataLoss") == "true")
    assert(!opts.contains("maxOffsetsPerTrigger"))
  }

  test("empty topic list is rejected") {
    assertThrows[IllegalArgumentException](Kafka.KafkaSourceConfig("b:9092", Nil))
  }

  test("sink config carries topic and checkpoint") {
    val cfg = Kafka.KafkaSinkConfig("b:9092", "enriched", "/ckpt/enriched")
    assert(cfg.options == Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "enriched",
      "checkpointLocation" -> "/ckpt/enriched"))
  }
}
