package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** First-class reads over a lake whose generations were written under
  * DRIFTED schemas — the reference's declared defect (SURVEY §4.1.6): batch
  * v1 writes `min_salary` as a STRING while v2 and the stream write
  * `salary_min` as a DOUBLE (reference: bigdata-project/src/spark_job.py:46
  * vs spark_streaming_v2.py:38), so a naive read of the combined lake
  * either loses a column or crashes on the type clash.
  *
  * Two composable pieces, matching the two drift modes:
  *   - ADDED columns: [[readMergedLake]] / [[unionEvolved]] surface the
  *     UNION of every generation's fields, null-filling where a slice
  *     predates a column;
  *   - RENAMED + RETYPED columns: [[coalesceEvolved]] folds the synonym
  *     family into one declared column via the first non-null `try_cast`,
  *     so v1's parseable strings convert and garbage degrades to null
  *     instead of failing the job under ANSI mode.
  *
  * Scale note: `mergeSchema` reads every file's FOOTER at planning time —
  * cheap relative to data, but at 100 TB prefer declaring the unified
  * schema once (`.schema(...)`) after the first merged discovery, which
  * skips footer reconciliation entirely; the null-filling read semantics
  * are identical. Partition pruning and predicate pushdown survive either
  * way (the evolved read is still one FileSourceScan).
  */
object SchemaEvolution {

  /** Read a parquet lake root whose files disagree on schema: Spark
    * reconciles the per-file schemas into their union (`mergeSchema`),
    * null-filling columns absent from older generations. Directory-style
    * generation markers (`gen=1/`, `gen=2/`) surface as an ordinary
    * partition column.
    */
  def readMergedLake(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** The same union-of-schemas semantics for slices read SEPARATELY (e.g.
    * generations living in different roots or formats):
    * `unionByName(allowMissingColumns = true)` over the slices — columns
    * are matched by NAME, never position, and each side's missing columns
    * null-fill. Result-equal to [[readMergedLake]] on a single root
    * (spec: `SchemaEvolutionSpec`).
    */
  def unionEvolved(slices: Seq[DataFrame]): DataFrame =
    slices.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Fold a drifted column family into one declared column: the first
    * non-null of `candidates`, each `try_cast` to `targetType` (renames
    * AND retypes in one move — v1's string `min_salary` and v2's double
    * `salary_min` both land in one double). `try_cast`, not `cast`: under
    * ANSI mode a malformed v1 string must degrade to null, not kill the
    * read of 100 TB over one bad row.
    */
  def coalesceEvolved(
      df: DataFrame,
      out: String,
      targetType: String,
      candidates: Seq[String]): DataFrame =
    df.withColumn(out,
      coalesce(candidates.map(c => expr(s"try_cast($c AS $targetType)")): _*))
}
