package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Streaming deduplication — the stream-side twin of the batch ingest
  * loop's exact-dedup stage (`Dedup.dedupAgainstFingerprintIndex`): drop a
  * document/event the moment a duplicate arrives, BEFORE it lands in the
  * lake, instead of scrubbing it out later.
  *
  * Built on `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`):
  * unbounded streams cannot keep per-key state forever — the watermark
  * bounds the dedup state to keys first seen within the delay window, so
  * state size tracks the duplicate-arrival horizon, not stream lifetime.
  * The guarantee is correspondingly scoped: duplicates arriving within
  * the watermark delay of the first occurrence are dropped; a duplicate
  * arriving after state eviction is re-admitted (and the BATCH fp-index
  * stage downstream catches those — the two layers compose, stream dedup
  * cutting the hot-window volume, the persisted index enforcing corpus
  * history).
  */
object StreamingDedup {

  /** Keep the first row per `keys` within the watermark horizon. */
  def dedupWithinWatermark(
      stream: DataFrame,
      keys: Seq[String],
      tsCol: String,
      watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)

  /** Content-exact document-stream dedup: fingerprint the text with the
    * SAME 16-byte binary md5 the batch fingerprint index keys on
    * ([[Text.fingerprintBinary]] — binary, not the 32-char hex form, so
    * the per-key streaming state is half the size) and keep the first
    * document per fingerprint within the watermark horizon. The
    * fingerprint column is internal — the output schema is the input's.
    *
    * NULL text carries no content to deduplicate on and is passed THROUGH,
    * matching the batch twin: `dropDuplicatesWithinWatermark` groups null
    * keys as equal, so routing null-text rows into the state store would
    * silently collapse distinct null-text documents into one, while the
    * batch index's null-safe semi/anti joins admit all of them.
    */
  def dedupDocStream(
      stream: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String): DataFrame = {
    // withColumn would silently REPLACE a caller column of the same name
    // and the final drop would then destroy it — refuse instead
    require(!stream.columns.contains("__graft_fp"),
      "dedupDocStream reserves the internal column name __graft_fp")
    val fp = stream
      .withColumn("__graft_fp", Text.fingerprintBinary(col(textCol)))
      .withWatermark(tsCol, watermark)
    fp.filter(col("__graft_fp").isNotNull)
      .dropDuplicatesWithinWatermark(Seq("__graft_fp"))
      .unionByName(fp.filter(col("__graft_fp").isNull))
      .drop("__graft_fp")
  }
}
