package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric-value normalization: the salary-pipeline semantics of the
  * reference, expressed as reusable Column ops.
  */
object ValueOps {

  /** Parse a money-ish string ("$120,000") to double by stripping everything
    * but digits and dot (F1, reference: bigdata-project/src/spark_job.py:44-47).
    *
    * `try_cast`, not `cast`: Spark 4 runs ANSI mode by default, where a cast
    * of a malformed/empty string THROWS. The reference ran Spark 3.4
    * (ANSI off) where it yielded null — try_cast preserves that contract.
    */
  def parseMoney(c: Column): Column =
    regexp_replace(c, "[^0-9.]", "").try_cast("double")

  /** Positive-value sanitation: non-positive → null (M7,
    * reference: bigdata-project/src/spark_batch_v2.py:75-80).
    */
  def positiveOrNull(c: Column): Column = when(c > 0, c)

  /** Fixed-rate currency conversion (M1, GBP→USD ×1.27,
    * reference: bigdata-project/src/spark_batch_v2.py:83-89). Rate is a
    * parameter, not a magic number (SURVEY §4.1.7).
    */
  def convertCurrency(amount: Column, currency: Column, from: String, rate: Double): Column =
    when(currency === from && amount.isNotNull, amount * rate).otherwise(amount)

  /** Null-safe midpoint with one-sided fallback (M2,
    * reference: bigdata-project/src/spark_batch_v2.py:97-103). Encoded as the
    * literal `when` ladder — NOT a bare `coalesce` — to keep the exact
    * null-propagation the reference has (SURVEY §7.4).
    */
  def midpoint(lo: Column, hi: Column): Column =
    when(lo.isNotNull && hi.isNotNull, (lo + hi) / 2.0)
      .when(lo.isNotNull, lo)
      .when(hi.isNotNull, hi)

  /** Range when both bounds present (M3). */
  def range(lo: Column, hi: Column): Column =
    when(lo.isNotNull && hi.isNotNull, hi - lo)
}
