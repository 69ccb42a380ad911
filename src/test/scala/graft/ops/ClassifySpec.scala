package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Classify.Rule("senior|sr\\.|lead", "Senior"),
    Classify.Rule("junior|jr\\.", "Junior"))

  private def classify(titles: Seq[String]): Seq[String] =
    titles.toDF("t").select(Classify.byRegex(col("t"), rules, "Mid")).as[String].collect().toSeq

  test("byRegex is case-insensitive and first-match-wins") {
    assert(classify(Seq("SENIOR engineer", "Jr. dev", "plain dev")) ==
      Seq("Senior", "Junior", "Mid"))
    // a title matching both rules takes the first rule's label
    assert(classify(Seq("senior junior hybrid")) == Seq("Senior"))
  }

  test("byRegex totality property: every input maps to exactly one in-domain label") {
    val labels = Set("Senior", "Junior", "Mid")
    // batch the generated titles into one Spark job — per-sample jobs would
    // take minutes
    val titles = Gen.listOfN(200, Gen.asciiPrintableStr).sample.get
    val out = classify(titles)
    assert(out.size == titles.size && out.forall(labels.contains))
  }

  test("byRegex agrees with a reference implementation (scalacheck)") {
    def oracle(t: String): String =
      if ("(?i)senior|sr\\.|lead".r.findFirstIn(t).isDefined) "Senior"
      else if ("(?i)junior|jr\\.".r.findFirstIn(t).isDefined) "Junior"
      else "Mid"
    val gen = Gen.listOfN(50, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.oneOf("Senior Dev", "sr. eng", "LEAD x", "jr. dev", "JUNIOR qa", "dev", "sen-ior")))
    val prop = Prop.forAll(gen) { ts => classify(ts) == ts.map(oracle) }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("byThreshold ladder: nulls, boundaries, top bucket") {
    val bounds = Seq(30.0 -> "LOW", 60.0 -> "MID")
    val df = Seq(Some(29.99), Some(30.0), Some(59.99), Some(60.0), None)
      .toDF("v")
      .select(Classify.byThreshold(col("v"), bounds, "TOP", "UNKNOWN"))
    assert(df.as[String].collect().toSeq == Seq("LOW", "MID", "MID", "TOP", "UNKNOWN"))
  }
}
