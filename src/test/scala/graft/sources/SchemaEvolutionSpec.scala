package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  // the reference's exact drift (SURVEY §4.1.6): v1 string min_salary,
  // v2 double salary_min + a new source column
  private def writeDriftedLake(): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-evolve").toString + "/lake"
    Seq((1L, "50000", "NY"), (2L, "not-a-number", "SF"))
      .toDF("job_id", "min_salary", "location")
      .write.parquet(s"$root/gen=1")
    Seq((3L, 70000.0, "LA", "board"))
      .toDF("job_id", "salary_min", "location", "source")
      .write.parquet(s"$root/gen=2")
    root
  }

  test("readMergedLake surfaces the UNION of drifted generations' columns, null-filled") {
    val merged = SchemaEvolution.readMergedLake(spark, writeDriftedLake())
    assert(Set("job_id", "min_salary", "salary_min", "location", "source", "gen")
      .subsetOf(merged.columns.toSet), merged.columns.mkString(","))
    val bySrc = merged.select("job_id", "salary_min", "source")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(bySrc(1L) == ((None, None)), "gen-1 rows must null-fill gen-2's columns")
    assert(bySrc(3L) == ((Some(70000.0), Some("board"))))
  }

  test("unionEvolved over separately-read slices == the merged single-root read") {
    val root = writeDriftedLake()
    val cols = Seq("job_id", "min_salary", "salary_min", "location", "source")
    val viaUnion = SchemaEvolution.unionEvolved(Seq(
        spark.read.parquet(s"$root/gen=1"), spark.read.parquet(s"$root/gen=2")))
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val viaMerge = SchemaEvolution.readMergedLake(spark, root)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(viaUnion == viaMerge, s"union $viaUnion\nmerge $viaMerge")
  }

  test("coalesceEvolved folds the renamed+retyped family; malformed v1 strings degrade to null under ANSI") {
    val merged = SchemaEvolution.readMergedLake(spark, writeDriftedLake())
    val out = SchemaEvolution
      .coalesceEvolved(merged, "salary_usd", "DOUBLE", Seq("salary_min", "min_salary"))
      .select("job_id", "salary_usd")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(50000.0), "v1 string must convert through try_cast")
    assert(out(2L) == None, "garbage must degrade to null, not fail the read")
    assert(out(3L) == Some(70000.0), "v2 double must pass through untouched")
  }
}
