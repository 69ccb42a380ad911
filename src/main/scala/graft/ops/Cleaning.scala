package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-validation, deduplication and canonicalization operators.
  *
  * Reference semantics: drop rows with null/empty key fields
  * (reference: bigdata-project/src/spark_batch_v2.py:53-60), dedup by id
  * (reference: bigdata-project/src/spark_batch_v2.py:49), canonicalize
  * strings with `upper(trim(...))`
  * (reference: bigdata-project/src/spark_batch_v2.py:68-71).
  */
object Cleaning {

  /** Not-null AND non-empty-string predicate across required columns (P2). */
  def validRows(df: DataFrame, requiredString: Seq[String], requiredAny: Seq[String] = Nil): DataFrame = {
    val strConds = requiredString.map(c => col(c).isNotNull && trim(col(c)) =!= "")
    val anyConds = requiredAny.map(c => col(c).isNotNull)
    (strConds ++ anyConds) match {
      case Nil   => df
      case conds => df.filter(conds.reduce(_ && _))
    }
  }

  /** Keyed dedup with DETERMINISTIC winner selection (P3).
    *
    * The reference uses `dropDuplicates(['job_id'])`, which keeps an
    * arbitrary row per key — non-reproducible across runs/partitionings. We
    * instead keep the row ranked first by `orderBy` within each key.
    *
    * Scale note: implemented with a single hash-partition window (one shuffle
    * on the key, same as dropDuplicates) rather than a global sort. For
    * heavily skewed keys prefer `groupBy(key).agg(min_by(struct(*), ord))`,
    * which gets map-side partial aggregation; the window form is kept because
    * it preserves all columns without re-expansion.
    */
  /** DETERMINISM CONTRACT: the winner is reproducible only when `orderBy`
    * is a TOTAL order within each key — rows tied on every order column
    * still pick a partition-order-dependent winner (the exact
    * non-reproducibility this op exists to fix). Callers whose order
    * columns can tie must append a content tiebreaker, e.g.
    * `md5(to_json(struct(cols)))` (see BatchPipeline).
    */
  def dedupByKey(df: DataFrame, key: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** `upper(trim(c))` canonicalization (F7). */
  def canonical(c: Column): Column = upper(trim(c))
}
