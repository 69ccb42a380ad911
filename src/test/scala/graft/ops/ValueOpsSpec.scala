package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class ValueOpsSpec extends SparkSpec {
  import spark.implicits._

  test("parseMoney strips currency formatting ($120,000 style)") {
    val out = Seq("$120,000", "85000.50 USD", "n/a", "")
      .toDF("s").select(ValueOps.parseMoney(col("s"))).as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(120000.0), Some(85000.5), None, None))
  }

  test("positiveOrNull nulls out non-positive values") {
    val out = Seq(10.0, 0.0, -5.0).toDF("v")
      .select(ValueOps.positiveOrNull(col("v"))).as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(10.0), None, None))
  }

  test("convertCurrency applies the rate only to the matching currency") {
    val out = Seq((100.0, "GBP"), (100.0, "USD")).toDF("amt", "ccy")
      .select(ValueOps.convertCurrency(col("amt"), col("ccy"), "GBP", 1.27))
      .as[Double].collect().toSeq
    assert(out == Seq(127.0, 100.0))
  }

  test("midpoint honors the reference's null ladder exactly") {
    val out = Seq(
      (Some(10.0), Some(20.0)),
      (Some(10.0), None),
      (None, Some(20.0)),
      (None: Option[Double], None: Option[Double]))
      .toDF("lo", "hi")
      .select(ValueOps.midpoint(col("lo"), col("hi"))).as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(15.0), Some(10.0), Some(20.0), None))
  }

  test("range only defined when both bounds present") {
    val out = Seq((Some(10.0), Some(25.0)), (Some(10.0), None))
      .toDF("lo", "hi")
      .select(ValueOps.range(col("lo"), col("hi"))).as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(15.0), None))
  }

  test("property: lo <= midpoint <= hi when both present (scalacheck)") {
    val gen = Gen.listOfN(100, for {
      lo <- Gen.choose(0.0, 1e6)
      hi <- Gen.choose(lo, 1e6)
    } yield (lo, hi))
    val prop = Prop.forAll(gen) { pairs =>
      val mids = pairs.toDF("lo", "hi")
        .select(col("lo"), ValueOps.midpoint(col("lo"), col("hi")), col("hi"))
        .as[(Double, Double, Double)].collect()
      mids.forall { case (lo, m, hi) => lo <= m && m <= hi }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }
}
