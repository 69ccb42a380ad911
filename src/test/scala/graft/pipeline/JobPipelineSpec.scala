package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen

import graft.SparkSpec
import graft.schema.JobSchema.JobPosting

class JobPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def job(
      id: String,
      company: String = "Acme",
      title: String = "Engineer",
      country: String = "US",
      lo: Option[Double] = Some(50000),
      hi: Option[Double] = Some(70000),
      ccy: String = "USD",
      workType: String = "FULL_TIME",
      expLevel: String = "Not Specified",
      remote: Boolean = false,
      listed: Long = 1704067200000L, // 2024-01-01
      views: Int = 0,
      applies: Int = 0,
      ingest: Double = 1.0): JobPosting =
    JobPosting(id, "linkedin", company, title, "d", "loc", country, "c", "s",
      lo, hi, ccy, workType, workType, workType, expLevel, remote, listed,
      views, applies, None, None, None, ingest)

  private def enrich(jobs: JobPosting*): DataFrame =
    JobPipeline.enrich(jobs.toSeq.toDF(), "2024-01-10")

  test("dedup keeps latest ingest; validation drops empty company/title") {
    val out = enrich(
      job("j1", ingest = 1.0, views = 1),
      job("j1", ingest = 2.0, views = 99),
      job("j2", company = ""),
      job("j3", title = "  "))
    assert(out.count() == 1)
    assert(out.select("views").as[Int].head() == 99)
  }

  test("salary chain: GBP conversion, midpoint, range, reference bucket labels") {
    val out = enrich(job("j1", lo = Some(40000), hi = Some(60000), ccy = "GBP"))
      .select("salary_min_usd", "salary_max_usd", "salary_avg", "salary_range", "salary_category")
      .as[(Double, Double, Double, Double, String)].head()
    assert(out._1 == 50800.0 && out._2 == 76200.0)
    assert(out._3 == 63500.0 && out._4 == 25400.0)
    assert(out._5 == "Senior Level")
    val noSalary = enrich(job("j2", lo = None, hi = None))
      .select("salary_category").as[String].head()
    assert(noSalary == "Not Specified")
  }

  test("experience: source preferred unless Not Specified, else title-derived") {
    val out = enrich(
      job("j1", title = "Senior Engineer", expLevel = "Not Specified"),
      job("j2", title = "Senior Engineer", expLevel = "Entry level"),
      job("j3", title = "intern dev", expLevel = "Not Specified"),
      job("j4", title = "plain dev", expLevel = "Not Specified"),
      job("j5", title = "Lead Architect", expLevel = "")) // empty counts as missing
      .select("job_id", "experience_level_final").as[(String, String)].collect().toMap
    assert(out == Map(
      "j1" -> "Senior", "j2" -> "Entry level", "j3" -> "Intern", "j4" -> "Mid-Level",
      "j5" -> "Senior"))
  }

  test("job taxonomy and work-type ladders use the reference's first-match order") {
    val out = enrich(
      job("j1", title = "Data Engineer"), // software rule wins over data (engineer)
      job("j2", title = "Data Analyst"),
      job("j3", title = "UX Designer"),
      job("j4", workType = "part-time stuff", title = "Florist"))
      .select("job_id", "job_category", "work_type_clean").as[(String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("j1") == (("Software Engineering", "FULL_TIME")))
    assert(out("j2") == (("Data & Analytics", "FULL_TIME")))
    assert(out("j3") == (("Design", "FULL_TIME")))
    assert(out("j4") == (("Other", "PART_TIME")))
  }

  test("freshness, calendar extracts, features, region") {
    val out = enrich(job("j1", listed = 1704067200000L, views = 200, applies = 4, country = "UK"))
      .select("days_since_posted", "job_freshness", "posted_day_of_week", "posted_month",
        "competition_score", "is_high_demand", "region")
      .as[(Int, String, Int, Int, Double, Boolean, String)].head()
    assert(out._1 == 9)
    assert(out._2 == "Active (1-4 weeks)") // 9 days: > 7, <= 30
    assert(out._3 == 2 && out._4 == 1) // 2024-01-01 is a Monday (Spark: Sun=1)
    assert(out._5 == 2.0 && out._6) // 4/200*100 = 2 < 5 with views>100
    assert(out._7 == "Europe")
  }

  test("aggregates produce the Cassandra table shapes incl. source_stats") {
    val enriched = enrich(
      job("j1", company = "A", remote = true),
      job("j2", company = "A"),
      job("j3", company = "B", ccy = "GBP"))
    val aggs = JobPipeline.aggregates(enriched)
    assert(aggs.keySet == Set("company_stats", "location_stats", "category_stats",
      "worktype_stats", "temporal_stats", "salary_distribution", "source_stats"))
    val company = aggs("company_stats")
    assert(company.columns.toSeq == Seq("company_name_clean", "job_count", "avg_salary",
      "min_salary", "max_salary", "salary_stddev", "avg_views", "avg_applies", "remote_jobs_count"))
    val a = company.filter($"company_name_clean" === "A")
      .select("job_count", "remote_jobs_count").as[(Long, Long)].head()
    assert(a == ((2L, 1L)))
    val src = aggs("source_stats").select("source", "job_count").as[(String, Long)].collect().toMap
    assert(src == Map("linkedin" -> 3L))
  }

  test("property: salary_min_usd <= salary_avg <= salary_max_usd when both present") {
    val gen = Gen.listOfN(60, for {
      lo <- Gen.choose(1000.0, 200000.0)
      hi <- Gen.choose(lo, 250000.0)
      gbp <- Gen.oneOf(true, false)
    } yield (lo, hi, gbp))
    val jobs = gen.sample.get.zipWithIndex.map { case ((lo, hi, gbp), i) =>
      job(s"j$i", lo = Some(lo), hi = Some(hi), ccy = if (gbp) "GBP" else "USD")
    }
    val bad = enrich(jobs: _*)
      .select("salary_min_usd", "salary_avg", "salary_max_usd")
      .as[(Double, Double, Double)].collect()
      .count { case (lo, m, hi) => !(lo <= m && m <= hi) }
    assert(bad == 0)
  }
}
