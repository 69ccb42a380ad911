package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV lake flavor of the S1 source matrix (round-12 verdict #5) — the
  * one mainstream lake format the matrix lacked next to parquet, JSON
  * (`JsonLake`) and ORC. Mirrors the reference's schema-declared batch
  * read (`bigdata-project/src/spark_batch_v2.py:33-36` reads the lake
  * with an explicit schema rather than inference) with the malformed-row
  * policy a production ingest needs.
  *
  * Contract:
  *   - The schema is DECLARED, never inferred — `inferSchema` costs a
  *     second full scan of a 100 TB lake and can flap a column's type
  *     between batches; a lake source's schema is part of its contract
  *     (the `Tables` discipline).
  *   - PERMISSIVE parse with an explicit corrupt-record column: a row
  *     with a type-invalid field, too few fields or extra fields keeps
  *     the raw line in [[CorruptCol]] (verified to agree exactly with
  *     DuckDB `ignore_errors`' drop set — the q112 oracle's contract);
  *     well-formed rows carry a NULL there. FAILFAST would abort a
  *     100 TB job on one bad line; DROPMALFORMED hides the loss.
  *   - [[wellFormed]]/[[quarantined]] split one read into the accept and
  *     audit paths (the multimodal quarantine discipline): corrupt rows
  *     are never silently dropped, they are routed.
  *
  * Mechanism: a splittable line scan + `from_csv`, NOT the csv scan
  * format. The scan format prunes the parse to the referenced columns,
  * which makes corruptness SELECTION-DEPENDENT — a row with a
  * type-invalid `metric` counts clean in `select(id)` and corrupt in
  * `select(*)` (verified; Spark documents the caveat). A quarantine
  * contract can't depend on which columns a consumer happens to touch,
  * and `from_csv` is one expression the optimizer can't split, so every
  * row's verdict is total-parse and stable. One scan, no shuffle; the
  * full parse is what the contract requires at any scale.
  */
object CsvLake {

  /** The corrupt-record column appended to every [[read]] schema. */
  val CorruptCol = "_graft_corrupt"

  /** Schema-declared permissive read; the returned frame carries the
    * declared columns plus [[CorruptCol]] (NULL for well-formed rows).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"$CorruptCol is reserved for the corrupt-record channel")
    val full = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    spark.read.text(path)
      .select(from_csv(col("value"), full,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("__r"))
      .select(full.fieldNames.map(f => col(s"__r.$f")).toIndexedSeq: _*)
  }

  /** The accept path: rows that parsed clean, corrupt channel dropped. */
  def wellFormed(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The audit path: malformed rows with their raw lines; the partially
    * parsed columns stay beside the raw line for triage.
    */
  def quarantined(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)
}
