package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-table → `when`-ladder compiler.
  *
  * The reference's workhorse pattern is first-match-wins `when(col.rlike(p),
  * label)` ladders for job category, experience level, work type, region and
  * freshness (reference: bigdata-project/src/spark_batch_v2.py:113-158,
  * 168-173, 204-208). We compile a declarative rule list into one Column so
  * every taxonomy shares a single, tested code path.
  *
  * Scale note: the ladder is pure Catalyst `CaseWhen` over `RLike` — fully
  * codegen'd, no UDF, constant-folded pattern compilation, so it stays inside
  * WholeStageCodegen on the scan projection.
  */
object Classify {

  final case class Rule(pattern: String, label: String)

  /** First-match-wins regex classification (F4/F5/F6). Case-insensitive. */
  def byRegex(c: Column, rules: Seq[Rule], default: String): Column =
    rules
      .foldLeft(Option.empty[Column]) { (acc, r) =>
        val cond = c.rlike("(?i)" + r.pattern)
        Some(acc.fold(when(cond, r.label))(_.when(cond, r.label)))
      }
      .fold(lit(default))(_.otherwise(default))

  /** Ordered numeric bucketing ladder: first upper bound that the value is
    * strictly below wins; null → `nullLabel` (M4/D7 salary & freshness
    * buckets, reference: bigdata-project/src/spark_batch_v2.py:113-119).
    */
  def byThreshold(c: Column, bounds: Seq[(Double, String)], top: String, nullLabel: String): Column = {
    val ladder = bounds.foldLeft(when(c.isNull, nullLabel)) { case (acc, (bound, label)) =>
      acc.when(c < bound, label)
    }
    ladder.otherwise(top)
  }
}
