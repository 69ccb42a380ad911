package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.schema.JobSchema

class JobNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val liCols = Seq("job_id", "company_name", "title", "description", "location",
    "min_salary", "max_salary", "currency", "work_type", "formatted_work_type",
    "formatted_experience_level", "remote_allowed", "listed_time", "views", "applies")

  private def linkedinRaw(rows: Seq[String]*) =
    rows.map(r => Row(r: _*)).toList
      .pipe(rs => spark.createDataFrame(
        spark.sparkContext.parallelize(rs),
        StructType(liCols.map(StructField(_, StringType, nullable = true)))))

  implicit class Pipe[A](a: A) { def pipe[B](f: A => B): B = f(a) }

  test("LinkedIn normalization: money strings, city/state split, bool parse, int coercion") {
    val raw = linkedinRaw(
      Seq("j1", "Acme", "Dev", "d", "Austin, TX", "120000.5", "", "USD", "FULL_TIME", "Full-time",
        "Senior", "true", "1700000000000", "10.0", "3"),
      Seq("j2", "Beta", "QA", "d", "Remoteville", "", "90000", "", "PART_TIME", "Part-time",
        "", "false", "", "", ""))
    val out = JobNormalize.normalizeLinkedIn(raw, ingestTs = lit(1.0))
    assert(out.schema.fieldNames.toSeq ==
      JobSchema.schema.fieldNames.filterNot(Seq("category", "latitude", "longitude").contains).toSeq)
    val r1 = out.filter($"job_id" === "j1").head()
    assert(r1.getAs[String]("location_city") == "Austin")
    assert(r1.getAs[String]("location_state") == "TX")
    assert(r1.getAs[Double]("salary_min") == 120000.5)
    assert(r1.isNullAt(r1.fieldIndex("salary_max"))) // empty string -> null
    assert(r1.getAs[Boolean]("remote_allowed"))
    assert(r1.getAs[Long]("listed_time") == 1700000000000L)
    assert(r1.getAs[Int]("views") == 10) // "10.0" -> int(float) coercion
    val r2 = out.filter($"job_id" === "j2").head()
    assert(r2.getAs[String]("location_state") == "") // no comma in location
    assert(r2.getAs[String]("salary_currency") == "USD") // empty -> default
    assert(!r2.getAs[Boolean]("remote_allowed"))
    assert(r2.getAs[Long]("listed_time") == 0L)
  }

  test("Adzuna normalization: nested extraction, area list, ISO-8601 epoch, GBP") {
    val raw = Seq(
      (101L, Map("display_name" -> "Globex"), "Eng", "d",
        ("London, UK", Seq("UK", "England", "London")), Some(50000.0), Some(0.0),
        "full_time", "permanent", "2024-01-15T10:30:00Z",
        Map("label" -> "IT Jobs"), Some(51.5), Some(-0.1)))
      .toDF("id", "company", "title", "description", "loc_tuple", "salary_min", "salary_max",
        "contract_time", "contract_type", "created", "category", "latitude", "longitude")
      .withColumn("location", struct(
        col("loc_tuple._1").as("display_name"), col("loc_tuple._2").as("area")))
      .drop("loc_tuple")
      .withColumn("company", struct(col("company")("display_name").as("display_name")))
      .withColumn("category", struct(col("category")("label").as("label")))
    val out = JobNormalize.normalizeAdzuna(raw, ingestTs = lit(2.0))
    val r = out.head()
    assert(r.getAs[String]("job_id") == "101")
    assert(r.getAs[String]("company_name") == "Globex")
    assert(r.getAs[String]("location_country") == "UK")
    assert(r.getAs[String]("location_city") == "London")
    assert(r.getAs[String]("location_state") == "England")
    assert(r.getAs[Double]("salary_min") == 50000.0)
    assert(r.isNullAt(r.fieldIndex("salary_max"))) // 0.0 -> null
    assert(r.getAs[String]("salary_currency") == "GBP")
    assert(r.getAs[String]("work_type") == "FULL_TIME")
    assert(r.getAs[String]("formatted_work_type") == "Full Time")
    assert(r.getAs[Long]("listed_time") == 1705314600000L) // 2024-01-15T10:30:00Z UTC
    assert(r.getAs[String]("category") == "IT Jobs")
  }

  test("garbage in an all-string record degrades to defaults instead of throwing under ANSI") {
    // Spark 4 runs ANSI mode by default: a plain cast(double->int) throws
    // CAST_OVERFLOW and to_unix_timestamp throws CANNOT_PARSE_TIMESTAMP —
    // one bad record must not kill the batch (review finding)
    val raw = linkedinRaw(
      Seq("j9", "Acme", "Dev", "d", "X", "-50000", "NaN", "USD", "FT", "ft",
        "", null, "junk", "9999999999", "1e10"))
    val r = JobNormalize.normalizeLinkedIn(raw, ingestTs = lit(1.0)).head()
    assert(r.isNullAt(r.fieldIndex("salary_min")), "negative salary must parse to null")
    assert(r.isNullAt(r.fieldIndex("salary_max")), "NaN salary must parse to null")
    assert(!r.getAs[Boolean]("remote_allowed"), "null remote_allowed must be false, not null")
    assert(r.getAs[Long]("listed_time") == 0L)
    assert(r.getAs[Int]("views") == 0, "out-of-int-range views must default to 0")
    assert(r.getAs[Int]("applies") == 0, "out-of-int-range applies must default to 0")

    val adRaw = Seq((7L, "C", "T", "d", Some(-1.0), Option.empty[Double],
      "full_time", "c", "not-a-timestamp", "L", 0.0, 0.0))
      .toDF("id", "cn", "title", "description", "salary_min", "salary_max",
        "contract_time", "contract_type", "created", "cat", "latitude", "longitude")
      .withColumn("company", struct(col("cn").as("display_name")))
      .withColumn("location", struct(
        lit("L").as("display_name"), array().cast("array<string>").as("area")))
      .withColumn("category", struct(col("cat").as("label")))
    val ar = JobNormalize.normalizeAdzuna(adRaw, ingestTs = lit(2.0)).head()
    assert(ar.getAs[Long]("listed_time") == 0L, "malformed created must degrade to 0")
    assert(ar.isNullAt(ar.fieldIndex("salary_min")), "negative Adzuna salary must be null")
  }

  test("unify merges partially-overlapping schemas with nulls for missing columns") {
    val li = JobNormalize.normalizeLinkedIn(
      linkedinRaw(Seq("j1", "Acme", "Dev", "d", "Austin, TX", "1", "2", "USD", "FULL_TIME",
        "Full-time", "Senior", "true", "0", "0", "0")),
      ingestTs = lit(1.0))
    val ad = JobNormalize.normalizeAdzuna(
      Seq((9L, "X", "T", "d", 1.0, 2.0, "full_time", "c", "2024-01-01T00:00:00Z", "L", 0.0, 0.0))
        .toDF("id", "cn", "title", "description", "salary_min", "salary_max",
          "contract_time", "contract_type", "created", "cat", "latitude", "longitude")
        .withColumn("company", struct(col("cn").as("display_name")))
        .withColumn("location", struct(
          lit("L").as("display_name"), array().cast("array<string>").as("area")))
        .withColumn("category", struct(col("cat").as("label"))),
      ingestTs = lit(2.0))
    val u = JobNormalize.unify(li, ad)
    assert(u.count() == 2)
    assert(u.schema.fieldNames.toSeq == JobSchema.schema.fieldNames.toSeq)
    val liRow = u.filter($"source" === "linkedin").head()
    assert(liRow.isNullAt(liRow.fieldIndex("category"))) // missing on linkedin side
  }
}
