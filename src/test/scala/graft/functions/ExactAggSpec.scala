package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class ExactAggSpec extends SparkSpec {
  import spark.implicits._

  test("property: floorDiv matches BigInt floor division for any sign (scalacheck)") {
    // the round-1 bug class: truncation vs floor on negative dividends, and
    // precision loss past 2^53 from double round-trips
    val gen = Gen.listOfN(50, for {
      a <- Gen.oneOf(Gen.choose(-1000000L, 1000000L), Gen.choose(-(1L << 60), 1L << 60))
      b <- Gen.choose(1L, 10000L)
    } yield (a, b))
    val prop = Prop.forAll(gen) { pairs =>
      val out = pairs.toDF("a", "b")
        .select(col("a"), col("b"), ExactAgg.floorDiv(col("a"), col("b")).as("q"))
        .as[(Long, Long, Long)].collect()
      out.forall { case (a, b, q) =>
        q == (BigInt(a) - (((BigInt(a) % b) + b) % b)) / b && q == Math.floorDiv(a, b)
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: divHalfUp is round-half-up of p/q (scalacheck)") {
    val gen = Gen.listOfN(50, for {
      p <- Gen.choose(-1000000L, 1000000L)
      q <- Gen.choose(1L, 10000L)
    } yield (p, q))
    val prop = Prop.forAll(gen) { pairs =>
      val out = pairs.toDF("p", "q")
        .select(col("p"), col("q"), ExactAgg.divHalfUp(col("p"), col("q")).as("r"))
        .as[(Long, Long, Long)].collect()
      out.forall { case (p, q, r) =>
        // half-up = floor(p/q + 1/2), ties rounding toward +inf; DECIMAL128
        // division error (1e-34) is far below the 1/(2q) tie distance
        val exact = BigDecimal(p) / BigDecimal(q) + BigDecimal("0.5")
        r == exact.setScale(0, BigDecimal.RoundingMode.FLOOR).toLongExact
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("avgExact2dp is exact on negative sums (the DuckDB // divergence class)") {
    // mean of (-994.28, -1.01) = -497.645 -> half-up at 4 decimals
    val out = Seq(-994.28, -1.01).toDF("v")
      .agg(ExactAgg.avgExact2dp(col("v")).as("m")).as[Double].head()
    assert(out == -497.6450)
  }
}
