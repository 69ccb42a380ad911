package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC container source (round-12 verdict #8): Common Crawl ships as
  * WARC, not pre-split text — a crawl→text pipeline starts at record
  * boundaries inside a binary container, so q106's HTML extraction needs
  * this reader in front of it to be the full WET step.
  *
  * Format (the ISO 28500 subset a response-record reader needs):
  * `WARC/1.0\r\n` + `Name: value\r\n` headers + `\r\n` + exactly
  * `Content-Length` body bytes + `\r\n\r\n`. Records are concatenated;
  * files are bounded by the ecosystem's ~1 GiB-per-file convention.
  *
  * Malformation policy (the multimodal codec discipline): a record with
  * a bad magic, an unparseable header block, a missing/non-numeric
  * Content-Length, a truncated body or a broken trailer is QUARANTINED
  * as (file, offset, reason) — never silently dropped, never fatal —
  * and the parser RESYNCS by scanning for the next record magic, so one
  * corrupt record costs itself, not its container.
  *
  * Scale shape: one `binaryFile` row per container (a bounded-size file
  * by convention — the reader's documented contract), records parsed by
  * byte offset inside the owning partition and emitted via flatMap; no
  * shuffle anywhere in the read. The sharded writer is the mirror: one
  * writer task per container file, rows routed by an explicit shard
  * partitioner, so corpus→container layout is deterministic and
  * driver-free.
  */
object Warc {

  /** One parsed row; `error` is NULL for a good record, else the
    * quarantine reason (record fields null). `warc_type` is `response`
    * for crawl payloads, `conversion` for WET-style derived text. */
  final case class Row(
      warc_file: String, offset: Long, warc_type: String, record_id: String,
      target_uri: String, content_type: String, content_length: Long,
      body: String, error: String)

  private val Version = "WARC/1.0"
  private val Magic: Array[Byte] = (Version + "\r\n").getBytes(UTF_8)
  private val HeaderEnd: Array[Byte] = "\r\n\r\n".getBytes(UTF_8)

  // ---------------------------------------------------------------- write

  /** Serialized record bytes. `warcType` is `response` for crawl payloads
    * and `conversion` for derived text (the WET convention — extraction
    * output is itself a WARC archive, which is what lets the crawl→text
    * chain round-trip through the same reader). `declaredLengthDelta`
    * skews the declared Content-Length (test/soak malformation
    * injection; 0 in production).
    */
  def recordBytes(
      recordId: String, targetUri: String, contentType: String,
      body: Array[Byte], declaredLengthDelta: Int = 0,
      warcType: String = "response"): Array[Byte] = {
    val header =
      s"""$Version\r
         |WARC-Type: $warcType\r
         |WARC-Record-ID: $recordId\r
         |WARC-Target-URI: $targetUri\r
         |Content-Type: $contentType\r
         |Content-Length: ${body.length + declaredLengthDelta}\r
         |\r
         |""".stripMargin
    val h = header.getBytes(UTF_8)
    val out = new Array[Byte](h.length + body.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    System.arraycopy(HeaderEnd, 0, out, h.length + body.length, 4)
    out
  }

  private class ShardPartitioner(shards: Int) extends Partitioner {
    override def numPartitions: Int = shards
    override def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** One gzip member per record — the Common Crawl `.warc.gz` layout
    * (members are individually decompressible, which is what lets a
    * reader split a crawl file without decompressing from byte 0).
    */
  private def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** Concatenated-member gunzip: GZIPInputStream consumes members until
    * the stream ends; a corrupt member surfaces as an IOException AFTER
    * the sound prefix decoded, so the caller keeps every record before
    * the corruption and quarantines the rest (returned reason).
    */
  private[graft] def gunzipMembers(bytes: Array[Byte]): (Array[Byte], String) = {
    val out = new java.io.ByteArrayOutputStream(bytes.length * 3)
    val buf = new Array[Byte](64 * 1024)
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      (out.toByteArray, null)
    } catch {
      case e: java.io.IOException =>
        (out.toByteArray, s"corrupt gzip member: ${e.getMessage}")
    }
  }

  /** Distributed container writer: rows
    * (shard, sort_key, record_id, target_uri, body, len_delta) land as
    * `part-<shard>.warc` (or `.warc.gz` with one gzip member per record
    * under `gzip = true` — the Common Crawl transport), one writer task
    * per container, records in sort_key order within it. Bodies are
    * strings (the HTML/WET case); Content-Length counts their UTF-8
    * bytes. Container size is the CALLER's contract (the WARC ~1 GiB
    * convention): a shard's records are sorted in the writer task's
    * memory.
    */
  def writeSharded(
      spark: SparkSession, rows: DataFrame, path: String, shards: Int,
      gzip: Boolean = false, contentType: String = "text/html",
      warcType: String = "response"): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    import spark.implicits._
    val fsConf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    // Configuration is not serializable; ship the (tiny) key-value map
    val confMap = {
      val it = fsConf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    rows
      .select(col("shard").cast("int"), col("sort_key").cast("long"),
        col("record_id"), col("target_uri"), col("body"), col("len_delta").cast("int"))
      .as[(Int, Long, String, String, String, Int)]
      .rdd.map(r => (r._1, r))
      .partitionBy(new ShardPartitioner(shards))
      .values
      .foreachPartition { it =>
        val recs = it.toArray
        if (recs.nonEmpty) {
          java.util.Arrays.sort(recs, Ordering.by[(Int, Long, String, String, String, Int), Long](_._2))
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confMap.foreach { case (k, v) => conf.set(k, v) }
          val ext = if (gzip) "warc.gz" else "warc"
          val target = new Path(path, f"part-${recs.head._1}%05d.$ext")
          val fs = target.getFileSystem(conf)
          val out = fs.create(target, true)
          try recs.foreach { case (_, _, rid, uri, body, delta) =>
            val rec = recordBytes(rid, uri, contentType, body.getBytes(UTF_8),
              delta, warcType)
            out.write(if (gzip) gzipMember(rec) else rec)
          } finally out.close()
        }
      }
  }

  // ---------------------------------------------------------------- parse

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Offset-scanning record parser with magic resync — see the
    * malformation policy above. Pure function of the bytes, exposed for
    * the spec battery. */
  private[graft] def parseFile(name: String, bytes: Array[Byte]): Seq[Row] = {
    val out = Seq.newBuilder[Row]
    def bad(offset: Int, reason: String): Unit =
      out += Row(name, offset.toLong, null, null, null, null, -1L, null, reason)
    var c = 0
    var done = bytes.length == 0
    while (!done) {
      val start = c
      val resync = () => {
        val next = indexOf(bytes, Magic, start + 1)
        if (next < 0) done = true else c = next
      }
      if (indexOf(bytes, Magic, start) != start) {
        bad(start, "bad magic"); resync()
      } else {
        val hdrEnd = indexOf(bytes, HeaderEnd, start)
        if (hdrEnd < 0) { bad(start, "unterminated header"); resync() }
        else {
          val headers = new String(bytes, start, hdrEnd - start, UTF_8)
            .split("\r\n").drop(1) // the version line
            .flatMap { l =>
              val i = l.indexOf(':')
              if (i < 0) None else Some(l.take(i).trim -> l.drop(i + 1).trim)
            }.toMap
          val len = headers.get("Content-Length").flatMap(_.toLongOption)
          if (len.isEmpty || len.get < 0) {
            bad(start, "missing or non-numeric Content-Length"); resync()
          } else {
            val bodyStart = hdrEnd + 4
            val bodyEnd = bodyStart + len.get
            if (bodyEnd + 4 > bytes.length) { bad(start, "truncated body"); resync() }
            else if (indexOf(bytes, HeaderEnd, bodyEnd.toInt) != bodyEnd.toInt) {
              bad(start, "trailer mismatch"); resync()
            } else {
              out += Row(name, start.toLong,
                headers.getOrElse("WARC-Type", ""),
                headers.getOrElse("WARC-Record-ID", ""),
                headers.getOrElse("WARC-Target-URI", ""),
                headers.getOrElse("Content-Type", ""),
                len.get,
                new String(bytes, bodyStart, len.get.toInt, UTF_8),
                null)
              c = bodyEnd.toInt + 4
              if (c >= bytes.length) done = true
            }
          }
        }
      }
    }
    out.result()
  }

  /** Read every `*.warc` / `*.warc.gz` container under `path`: one
    * binaryFile row per container (gzip members decompressed in the
    * owning task — a corrupt member quarantines the file's TAIL, keeping
    * every record before it), records + quarantine rows flat-mapped out
    * inside the owning partition. Offsets are within the DECOMPRESSED
    * stream for gz containers. Split with [[records]]/[[quarantined]].
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/*.warc*")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, raw) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        if (!name.endsWith(".gz")) parseFile(name, raw)
        else {
          val (bytes, err) = gunzipMembers(raw)
          val rows = parseFile(name, bytes)
          if (err == null) rows
          else rows :+ Row(name, bytes.length.toLong, null, null, null, null, -1L, null, err)
        }
      }
      .toDF()
  }

  /** The accept path: parsed records, quarantine channel dropped. */
  def records(df: DataFrame): DataFrame =
    df.filter(col("error").isNull).drop("error")

  /** The audit path: (file, offset, reason) per malformed record. */
  def quarantined(df: DataFrame): DataFrame =
    df.filter(col("error").isNotNull).select("warc_file", "offset", "error")
}
