package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-source → unified-record normalization, the producer's Python dict
  * munging (reference: bigdata-project/src/producer_v2.py:34-100)
  * re-expressed as Spark projections so it runs distributed on the raw
  * lake instead of row-at-a-time in an ingestion process.
  *
  * Documented deviation (SURVEY §4.1 spirit): the reference's
  * `bool(job.get('remote_allowed'))` treats ANY non-empty string — even
  * "false"/"0" — as true; we parse "true"/"1" (case-insensitive) as true,
  * which is the intended semantics of an all-string source record.
  */
object JobNormalize {

  private def emptyToNull(c: Column): Column = when(trim(c) =!= "", trim(c))

  /** Positive-double parse of an all-string salary field: empty/garbage/
    * non-positive → null (producer: `float(x) if x else None`). Strictly
    * `> 0`, not `≠ 0`: a negative salary string is garbage for this
    * domain and must degrade to null like any other unparseable value,
    * not flow into salary_avg/salary_category as a real number (review
    * finding).
    */
  private def parseSalary(c: Column): Column = {
    val d = c.try_cast("double")
    // !isnan: Spark orders NaN ABOVE every double, so "NaN" would pass a
    // bare `> 0` and flow into salary math as a real number
    when(d.isNotNull && !isnan(d) && d > 0.0, d)
  }

  /** LinkedIn-replay raw records: 31 flat ALL-STRING fields
    * (reference: demo/src/main/java/com/example/demo/model/JobPosting.java:6-90).
    * Expects columns: job_id, company_name, title, description, location,
    * min_salary, max_salary, currency, work_type, formatted_work_type,
    * formatted_experience_level, remote_allowed, listed_time, views,
    * applies.
    */
  def normalizeLinkedIn(raw: DataFrame, ingestTs: Column = current_timestamp().cast("double")): DataFrame =
    raw.select(
      col("job_id"),
      lit("linkedin").as("source"),
      col("company_name"),
      col("title"),
      col("description"),
      col("location"),
      lit("US").as("location_country"),
      coalesce(trim(split(col("location"), ",")(0)), lit("")).as("location_city"),
      when(col("location").contains(","), trim(split(col("location"), ",")(1)))
        .otherwise("").as("location_state"),
      parseSalary(col("min_salary")).as("salary_min"),
      parseSalary(col("max_salary")).as("salary_max"),
      coalesce(emptyToNull(col("currency")), lit("USD")).as("salary_currency"),
      col("work_type"),
      col("formatted_work_type"),
      col("work_type").as("contract_type"),
      col("formatted_experience_level").as("experience_level"),
      // coalesce: `isin` on a NULL input propagates null, but the
      // reference's bool(job.get('remote_allowed')) maps a missing field
      // to False — and a null here silently drops rows from any
      // `remote_allowed = false` filter downstream (review finding)
      coalesce(lower(trim(col("remote_allowed"))).isin("true", "1"), lit(false))
        .as("remote_allowed"),
      coalesce(col("listed_time").try_cast("long"), lit(0L)).as("listed_time"),
      // try_cast BOTH hops: a plain cast(double→int) THROWS under Spark 4's
      // default ANSI mode for out-of-int-range/NaN values ('9999999999',
      // '1e10') — verified CAST_OVERFLOW on this Spark — where this
      // all-string normalizer's contract is garbage → default (review
      // finding)
      coalesce(col("views").try_cast("double").try_cast("int"), lit(0)).as("views"),
      coalesce(col("applies").try_cast("double").try_cast("int"), lit(0)).as("applies"),
      ingestTs.as("ingest_timestamp"))

  /** Adzuna raw records: nested objects (`company.display_name`,
    * `location.area[]`, ISO-8601 `created`), typed salaries, GBP
    * (reference: bigdata-project/src/producer_v2.py:65-97).
    */
  def normalizeAdzuna(raw: DataFrame, ingestTs: Column = current_timestamp().cast("double")): DataFrame =
    raw.select(
      col("id").cast("string").as("job_id"),
      lit("adzuna").as("source"),
      coalesce(col("company.display_name"), lit("Unknown")).as("company_name"),
      col("title"),
      col("description"),
      col("location.display_name").as("location"),
      when(size(col("location.area")) > 0, element_at(col("location.area"), 1))
        .otherwise("UK").as("location_country"),
      when(size(col("location.area")) > 0, element_at(col("location.area"), -1))
        .otherwise("").as("location_city"),
      when(size(col("location.area")) > 1, element_at(col("location.area"), -2))
        .otherwise("").as("location_state"),
      when(col("salary_min").isNotNull && !isnan(col("salary_min")) && col("salary_min") > 0.0,
        col("salary_min")).as("salary_min"),
      when(col("salary_max").isNotNull && !isnan(col("salary_max")) && col("salary_max") > 0.0,
        col("salary_max")).as("salary_max"),
      lit("GBP").as("salary_currency"),
      upper(regexp_replace(col("contract_time"), "-", "_")).as("work_type"),
      initcap(regexp_replace(col("contract_time"), "_", " ")).as("formatted_work_type"),
      col("contract_type"),
      lit("Not Specified").as("experience_level"),
      lit(false).as("remote_allowed"),
      // try_to_timestamp, NOT to_unix_timestamp: under Spark 4's default
      // ANSI mode the latter THROWS on any malformed 'created' string
      // (verified CANNOT_PARSE_TIMESTAMP on this Spark) — one bad record
      // would kill the whole batch where the contract is degrade-to-0
      // (review finding). The epoch cast of a timestamp is exact.
      coalesce(
        (try_to_timestamp(col("created"), lit("yyyy-MM-dd'T'HH:mm:ss'Z'")).cast("long") * 1000)
          .try_cast("long"),
        lit(0L)).as("listed_time"),
      lit(0).as("views"),
      lit(0).as("applies"),
      col("category.label").as("category"),
      col("latitude"),
      col("longitude"),
      ingestTs.as("ingest_timestamp"))

  /** The producer's in-Python schema union of two partially-overlapping
    * sources (reference: bigdata-project/src/producer_v2.py:152-163) —
    * exactly `unionByName(allowMissingColumns)`: LinkedIn rows get null
    * category/latitude/longitude.
    */
  def unify(linkedin: DataFrame, adzuna: DataFrame): DataFrame =
    linkedin.unionByName(adzuna, allowMissingColumns = true)
      // unionByName appends absent columns last; pin the canonical order
      .select(graft.schema.JobSchema.schema.fieldNames.map(col).toIndexedSeq: _*)
}
