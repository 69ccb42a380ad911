package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.{Classify, Cleaning, Features, Temporal, ValueOps}

/** The reference's FULL batch enrichment on the canonical job-posting
  * schema, ladder for ladder
  * (reference: bigdata-project/src/spark_batch_v2.py:49-208). Labels and
  * thresholds are kept verbatim so a user of the reference sees identical
  * values out of every derived column.
  *
  * Deviations by design (SURVEY §4.1): dedup is deterministic
  * (latest ingest_timestamp wins, not dropDuplicates' arbitrary row), the
  * report date is a parameter, and GBP→USD is a named constant.
  */
object JobPipeline {

  val GbpToUsd = 1.27

  val categoryRules: Seq[Classify.Rule] = Seq(
    Classify.Rule("software|developer|engineer|programming|backend|frontend|fullstack", "Software Engineering"),
    Classify.Rule("data|analyst|scientist|analytics|bi|business intelligence", "Data & Analytics"),
    Classify.Rule("manager|management|director|product manager", "Management"),
    Classify.Rule("marketing|social media|seo|content|digital marketing", "Marketing"),
    Classify.Rule("sales|account|business development", "Sales"),
    Classify.Rule("design|designer|ux|ui|graphic", "Design"),
    Classify.Rule("devops|cloud|infrastructure|sre", "DevOps/Cloud"),
    Classify.Rule("qa|quality|test|tester", "QA/Testing"),
    Classify.Rule("hr|human resource|recruiter", "Human Resources"))

  val experienceRules: Seq[Classify.Rule] = Seq(
    Classify.Rule("intern|internship", "Intern"),
    Classify.Rule("junior|jr\\.|entry|graduate|associate", "Junior"),
    Classify.Rule("senior|sr\\.|lead|principal|staff", "Senior"),
    Classify.Rule("manager|director|head|vp|chief|cto|ceo", "Manager/Executive"))

  val workTypeRules: Seq[Classify.Rule] = Seq(
    Classify.Rule("full", "FULL_TIME"),
    Classify.Rule("part", "PART_TIME"),
    Classify.Rule("contract", "CONTRACT"),
    Classify.Rule("temporary", "TEMPORARY"))

  /** Clean + enrich + feature-engineer, 1:1 with the reference's steps. */
  def enrich(unified: DataFrame, reportDate: String): DataFrame = {
    val cleaned = Cleaning.validRows(
      Cleaning.dedupByKey(unified, Seq("job_id"), Seq(col("ingest_timestamp").desc)),
      requiredString = Seq("job_id", "company_name", "title"))

    cleaned
      // canonicalization (F7)
      .withColumn("company_name_clean", Cleaning.canonical(col("company_name")))
      .withColumn("title_clean", trim(col("title")))
      .withColumn("location_clean", Cleaning.canonical(col("location")))
      .withColumn("location_country_clean", Cleaning.canonical(col("location_country")))
      // salary sanitation (M7) + currency (M1) + midpoint/range (M2/M3)
      .withColumn("salary_min_clean", ValueOps.positiveOrNull(col("salary_min")))
      .withColumn("salary_max_clean", ValueOps.positiveOrNull(col("salary_max")))
      .withColumn("salary_min_usd",
        ValueOps.convertCurrency(col("salary_min_clean"), col("salary_currency"), "GBP", GbpToUsd))
      .withColumn("salary_max_usd",
        ValueOps.convertCurrency(col("salary_max_clean"), col("salary_currency"), "GBP", GbpToUsd))
      .withColumn("salary_avg", ValueOps.midpoint(col("salary_min_usd"), col("salary_max_usd")))
      .withColumn("salary_range", ValueOps.range(col("salary_min_usd"), col("salary_max_usd")))
      // salary bucketing (M4) — reference labels verbatim
      .withColumn("salary_category",
        Classify.byThreshold(col("salary_avg"),
          Seq(30000.0 -> "Entry Level", 60000.0 -> "Mid Level", 100000.0 -> "Senior Level"),
          top = "Executive Level", nullLabel = "Not Specified"))
      // experience: derived from title (F4), source value preferred (M9)
      .withColumn("experience_level_derived",
        Classify.byRegex(col("title_clean"), experienceRules, "Mid-Level"))
      // Documented deviation (SURVEY §4.1): the reference's guard lets the
      // producer's empty-string default through, so the title-derived level
      // almost never applies to LinkedIn rows; empty counts as missing here.
      .withColumn("experience_level_final",
        when(col("experience_level").isNotNull && col("experience_level") =!= "Not Specified"
          && trim(col("experience_level")) =!= "",
          col("experience_level"))
          .otherwise(col("experience_level_derived")))
      // 9-way job taxonomy (F5)
      .withColumn("job_category", Classify.byRegex(col("title_clean"), categoryRules, "Other"))
      // work type normalization (F6)
      .withColumn("work_type_clean", Classify.byRegex(col("work_type"), workTypeRules, "Other"))
      // temporal derivations (D1/D3/D6/D7/D4) — through the Temporal ops
      // (the designated single implementations), not inline re-derivations
      // that can drift from the tested ladders (review finding)
      .withColumn("listed_date", Temporal.epochMillisToDate(col("listed_time")))
      .withColumn("event_date", lit(reportDate).cast("date"))
      .withColumn("days_since_posted", datediff(col("event_date"), col("listed_date")))
      .withColumn("job_freshness",
        Temporal.freshness(
          col("days_since_posted"),
          labels = Seq("Fresh (< 24h)", "Recent (1-7 days)", "Active (1-4 weeks)", "Old (> 30 days)"),
          nullLabel = None)) // reference-verbatim: null days → the Old bucket
      .withColumn("posted_day_of_week", dayofweek(col("listed_date")))
      .withColumn("posted_month", month(col("listed_date")))
      .withColumn("posted_quarter", quarter(col("listed_date")))
      // metadata (D5)
      .withColumn("ingest_type", lit("batch"))
      .withColumn("processing_timestamp", current_timestamp())
      // features (M5/M6/M8) — via the Features ops, same single-source
      // argument as the temporal ladder above; coalesce keeps this
      // pipeline's false-on-null flag semantics over highDemand's
      // null-propagating boolean
      .withColumn("competition_score",
        Features.guardedRatio(col("applies"), col("views")))
      .withColumn("is_high_demand",
        coalesce(
          Features.highDemand(col("views"), col("competition_score"), 100, 5),
          lit(false)))
      .withColumn("region",
        when(col("location_country_clean") === "US", "North America")
          .when(col("location_country_clean") === "UK", "Europe")
          .otherwise("Other"))
  }

  private def remoteCount: Column = sum(when(col("remote_allowed"), 1).otherwise(0))

  /** The six Cassandra aggregate tables + the declared-but-never-built
    * source_stats (SURVEY §4.1.4), shapes per
    * reference: bigdata-project/src/spark_batch_v2.py:261-341 and
    * k8s/init-job.yaml:33-92.
    */
  def aggregates(enriched: DataFrame): Map[String, DataFrame] = Map(
    "company_stats" -> enriched.groupBy("company_name_clean")
      .agg(
        count(col("job_id")).as("job_count"),
        avg(col("salary_avg")).as("avg_salary"),
        min(col("salary_min_usd")).as("min_salary"),
        max(col("salary_max_usd")).as("max_salary"),
        stddev_samp(col("salary_avg")).as("salary_stddev"),
        avg(col("views")).as("avg_views"),
        avg(col("applies")).as("avg_applies"),
        remoteCount.as("remote_jobs_count")),
    "location_stats" -> enriched.groupBy("location_country_clean", "location_city", "region")
      .agg(
        count(col("job_id")).as("job_count"),
        avg(col("salary_avg")).as("avg_salary"),
        remoteCount.as("remote_jobs_count")),
    "category_stats" -> enriched.groupBy("job_category", "experience_level_final")
      .agg(
        count(col("job_id")).as("job_count"),
        avg(col("salary_avg")).as("avg_salary"),
        percentile_approx(col("salary_avg"), lit(0.5), lit(10000)).as("median_salary"),
        percentile_approx(col("salary_avg"), lit(0.25), lit(10000)).as("p25_salary"),
        percentile_approx(col("salary_avg"), lit(0.75), lit(10000)).as("p75_salary")),
    "worktype_stats" -> enriched.groupBy("work_type_clean")
      .agg(
        count(col("job_id")).as("job_count"),
        avg(col("salary_avg")).as("avg_salary"),
        count(when(col("salary_avg").isNotNull, lit(1))).as("jobs_with_salary")),
    "temporal_stats" -> enriched.groupBy("posted_day_of_week", "posted_month")
      .agg(count(col("job_id")).as("job_count"), avg(col("salary_avg")).as("avg_salary")),
    "salary_distribution" -> enriched.groupBy("salary_category", "job_category")
      .agg(count(col("job_id")).as("job_count")),
    "source_stats" -> enriched.groupBy("source")
      .agg(
        count(col("job_id")).as("job_count"),
        avg(col("salary_avg")).as("avg_salary"),
        remoteCount.as("remote_jobs_count"),
        avg(col("competition_score")).as("avg_competition")))
}
