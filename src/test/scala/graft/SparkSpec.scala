package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (Test / fork := true gives
  * the suite its own JVM; building a session per spec would dominate test
  * time).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[2]")
    .appName("graft-test")
    // SPARK_GRAFT_ANSI=true runs the whole suite in ANSI mode (the
    // forward-compat sweep GraftSession.ansiSweep documents)
    .config("spark.sql.ansi.enabled", GraftSession.ansiSweep.toString)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // static conf: must be set when the FIRST session/context is built
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    // mirror the engine's generated-class cache sizing (GraftSession) so
    // the suite runs the same static config the harnesses run
    .config("spark.sql.codegen.cache.maxEntries", "2000")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
