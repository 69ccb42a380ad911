package graft.schema

import org.apache.spark.sql.types._

/** Canonical job-posting record — ONE schema shared by batch and streaming
  * (fixing the reference's batch/stream drift, SURVEY §4.1.6).
  *
  * Field set from the declared streaming schema
  * (reference: bigdata-project/src/spark_streaming_v2.py:28-52) unioned
  * with the producer envelope
  * (reference: bigdata-project/src/producer_v2.py:37-97).
  */
object JobSchema {

  val schema: StructType = StructType(Seq(
    StructField("job_id", StringType, nullable = false),
    StructField("source", StringType),
    StructField("company_name", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("location", StringType),
    StructField("location_country", StringType),
    StructField("location_city", StringType),
    StructField("location_state", StringType),
    StructField("salary_min", DoubleType),
    StructField("salary_max", DoubleType),
    StructField("salary_currency", StringType),
    StructField("work_type", StringType),
    StructField("formatted_work_type", StringType),
    StructField("contract_type", StringType),
    StructField("experience_level", StringType),
    StructField("remote_allowed", BooleanType),
    StructField("listed_time", LongType), // epoch millis
    StructField("views", IntegerType),
    StructField("applies", IntegerType),
    StructField("category", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("ingest_timestamp", DoubleType))) // epoch seconds

  final case class JobPosting(
      job_id: String,
      source: String,
      company_name: String,
      title: String,
      description: String,
      location: String,
      location_country: String,
      location_city: String,
      location_state: String,
      salary_min: Option[Double],
      salary_max: Option[Double],
      salary_currency: String,
      work_type: String,
      formatted_work_type: String,
      contract_type: String,
      experience_level: String,
      remote_allowed: Boolean,
      listed_time: Long,
      views: Int,
      applies: Int,
      category: Option[String],
      latitude: Option[Double],
      longitude: Option[Double],
      ingest_timestamp: Double)
}
