package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, body: String, delta: Int = 0): Array[Byte] =
    Warc.recordBytes(s"urn:graft:$id", s"https://h/p/$id", "text/html",
      body.getBytes(UTF_8), delta)

  test("sharded write + read round-trips records in sort order, one container per shard") {
    val dir = Files.createTempDirectory("warc").toString
    val rows = (0L until 20L).map(i =>
      (i % 4, i, s"urn:graft:$i", s"https://h/p/$i", s"body of $i", 0))
      .toDF("shard", "sort_key", "record_id", "target_uri", "body", "len_delta")
    Warc.writeSharded(spark, rows, s"$dir/warc", shards = 4)
    assert(new java.io.File(s"$dir/warc").listFiles().count(_.getName.endsWith(".warc")) == 4)
    val out = Warc.records(Warc.read(spark, s"$dir/warc"))
    assert(out.count() == 20L)
    val got = out.select("record_id", "target_uri", "content_type", "content_length", "body")
      .as[(String, String, String, Long, String)].collect().toSet
    assert(got == (0L until 20L).map(i =>
      (s"urn:graft:$i", s"https://h/p/$i", "text/html", s"body of $i".length.toLong,
        s"body of $i")).toSet)
    // offsets are monotone within each container (the scan is sequential)
    val offs = Warc.read(spark, s"$dir/warc")
      .select("warc_file", "offset").as[(String, Long)].collect()
      .groupBy(_._1).values
    assert(offs.forall(f => f.map(_._2).sorted.toSeq == f.map(_._2).toSeq || f.sortBy(_._2).toSeq == f.toSeq))
  }

  test("content-length counts UTF-8 BYTES, not characters") {
    val body = "café 試"
    val rows = Warc.parseFile("f", rec(1L, body))
    assert(rows.size == 1 && rows.head.error == null)
    assert(rows.head.content_length == body.getBytes(UTF_8).length.toLong)
    assert(rows.head.body == body)
  }

  test("malformation battery: each kind quarantines with its offset and the parser resyncs") {
    val good = rec(1L, "good one")
    val after = rec(2L, "recovered")
    def parse(bytes: Array[Byte]) = Warc.parseFile("f", bytes)
    // garbage prefix -> bad magic at 0, then both records recovered
    val garbage = "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8) ++ good ++ after
    val p1 = parse(garbage)
    assert(p1.count(_.error != null) == 1 && p1.head.error == "bad magic" && p1.head.offset == 0L)
    assert(p1.count(_.error == null) == 2)
    // wrong declared length -> trailer mismatch, next record recovered
    val p2 = parse(rec(1L, "mislabeled body", delta = -5) ++ after)
    assert(p2.map(_.error).toSeq == Seq("trailer mismatch", null))
    assert(p2.last.record_id == "urn:graft:2")
    // missing Content-Length
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nx\r\n\r\n").getBytes(UTF_8)
    assert(parse(noLen ++ after).map(_.error).toSeq ==
      Seq("missing or non-numeric Content-Length", null))
    // declared length runs past the container -> truncated body
    val p4 = parse(rec(1L, "tail", delta = 10000))
    assert(p4.map(_.error).toSeq == Seq("truncated body"))
    // unterminated header at EOF
    val p5 = parse("WARC/1.0\r\nWARC-Type: resp".getBytes(UTF_8))
    assert(p5.map(_.error).toSeq == Seq("unterminated header"))
    // empty container -> nothing, not an error
    assert(parse(Array.emptyByteArray).isEmpty)
  }

  test("gzip containers: one member per record, one read consumes plain and gz alike") {
    val dir = Files.createTempDirectory("warc_gz").toString
    def rows(ids: Range) = ids.map(i =>
      (i.toLong % 2, i.toLong, s"urn:graft:$i", s"https://h/p/$i", s"payload $i", 0))
      .toDF("shard", "sort_key", "record_id", "target_uri", "body", "len_delta")
    Warc.writeSharded(spark, rows(0 until 8), s"$dir/warc", shards = 2)
    Warc.writeSharded(spark, rows(8 until 16), s"$dir/warc", shards = 2, gzip = true)
    val names = new java.io.File(s"$dir/warc").listFiles().map(_.getName).sorted.toSeq
    assert(names.count(_.endsWith(".warc")) == 2 && names.count(_.endsWith(".warc.gz")) == 2)
    // per-record members: each record starts its own gzip magic
    val gzBytes = java.nio.file.Files.readAllBytes(
      new java.io.File(s"$dir/warc", names.filter(_.endsWith(".gz")).head).toPath)
    val magics = gzBytes.sliding(2).count(w => (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b)
    assert(magics == 4, s"expected one gzip member per record, saw $magics")
    // one read, both transports, all 16 records
    val out = Warc.records(Warc.read(spark, s"$dir/warc"))
    assert(out.count() == 16L)
    assert(out.select("record_id").as[String].collect().toSet ==
      (0 until 16).map(i => s"urn:graft:$i").toSet)
  }

  test("a corrupt gzip member quarantines the container's TAIL, keeping the sound prefix") {
    val dir = Files.createTempDirectory("warc_gzbad").toString
    val good = (0 until 3).map(i => rec(i, s"payload $i"))
    val gz = good.map { r =>
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(r); g.close()
      bos.toByteArray
    }
    // corrupt the THIRD member's deflate payload
    val bad = gz(2).clone()
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x5a).toByte
    java.nio.file.Files.write(
      new java.io.File(dir, "c.warc.gz").toPath, (gz(0) ++ gz(1) ++ bad))
    val out = Warc.read(spark, dir)
    val goodIds = Warc.records(out).select("record_id").as[String].collect().toSet
    assert(goodIds == Set("urn:graft:0", "urn:graft:1"))
    val q = Warc.quarantined(out).select("error").as[String].collect()
    assert(q.exists(_.startsWith("corrupt gzip member")), q.toSeq.toString)
  }

  test("WET round trip: extracted text writes as conversion records and reads back") {
    val dir = Files.createTempDirectory("wet").toString
    val docs = (0L until 10L)
      .map(i => (i, s"<p>body &amp; text of $i</p>")).toDF("doc_id", "html")
    val extracted = docs.select(
      (col("doc_id") % 2).as("shard"),
      col("doc_id").as("sort_key"),
      concat(lit("urn:wet:"), col("doc_id")).as("record_id"),
      concat(lit("https://h/p/"), col("doc_id")).as("target_uri"),
      graft.functions.Html.extractText(col("html")).as("body"),
      lit(0).as("len_delta"))
    Warc.writeSharded(spark, extracted, s"$dir/wet", shards = 2,
      gzip = true, contentType = "text/plain", warcType = "conversion")
    val back = Warc.records(Warc.read(spark, s"$dir/wet"))
    assert(back.count() == 10L)
    assert(back.select("warc_type").distinct().as[String].collect().toSeq ==
      Seq("conversion"))
    assert(back.select("content_type").distinct().as[String].collect().toSeq ==
      Seq("text/plain"))
    val bodies = back.select("record_id", "body").as[(String, String)].collect().toMap
    assert((0L until 10L).forall(i => bodies(s"urn:wet:$i") == s"body & text of $i"))
  }

  test("header-borne strings with CR/LF are rejected before they can corrupt framing") {
    val e = intercept[IllegalArgumentException] {
      Warc.recordBytes("urn:x\r\nWARC-Type: evil", "https://h/p", "text/html",
        "b".getBytes(UTF_8))
    }
    assert(e.getMessage.contains("no CR/LF"))
    intercept[IllegalArgumentException] {
      Warc.recordBytes("urn:x", "https://h/p\ninjected", "text/html",
        "b".getBytes(UTF_8))
    }
  }

  test("an out-of-range shard key fails fast with a descriptive error, not an AIOOBE") {
    val dir = Files.createTempDirectory("warc_badshard").toString
    val rows = Seq((7L, 1L, "urn:graft:1", "https://h/p/1", "b", 0))
      .toDF("shard", "sort_key", "record_id", "target_uri", "body", "len_delta")
    val e = intercept[org.apache.spark.SparkException] {
      Warc.writeSharded(spark, rows, s"$dir/warc", shards = 2)
    }
    assert(e.getMessage.contains("outside [0, 2)") ||
      Option(e.getCause).exists(_.getMessage.contains("outside [0, 2)")))
  }

  test("maxContainerBytes rolls output into bounded containers that round-trip") {
    val dir = Files.createTempDirectory("warc_roll").toString
    val body = "x" * 400
    val rows = (0L until 30L).map(i =>
      (0L, i, s"urn:graft:$i", s"https://h/p/$i", body, 0))
      .toDF("shard", "sort_key", "record_id", "target_uri", "body", "len_delta")
    Warc.writeSharded(spark, rows, s"$dir/warc", shards = 1,
      maxContainerBytes = 2000L)
    val files = new java.io.File(s"$dir/warc").listFiles()
      .filter(_.getName.endsWith(".warc")).sortBy(_.getName)
    assert(files.length > 1, "expected the writer to roll containers")
    // every container except possibly the last is within one record of
    // the target (a record is never split)
    val recBytes = Warc.recordBytes("urn:graft:0", "https://h/p/0",
      "text/html", body.getBytes(UTF_8)).length
    files.dropRight(1).foreach { f =>
      assert(f.length <= 2000L + recBytes, s"${f.getName} = ${f.length}")
      assert(f.length >= 2000L - recBytes, s"${f.getName} = ${f.length}")
    }
    // rolled naming: part-SSSSS-RRRR.warc, sequence order = sort order
    assert(files.forall(_.getName.matches("part-00000-\\d{4}\\.warc")))
    val back = Warc.records(Warc.read(spark, s"$dir/warc"))
    assert(back.count() == 30L)
    // global sort order is preserved across the roll boundary: within
    // each container offsets ascend, and file sequence follows sort_key
    val ids = back
      .withColumn("seq", regexp_extract(col("warc_file"), "part-00000-(\\d+)", 1).cast("int"))
      .orderBy("seq", "offset")
      .select(regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1).cast("long"))
      .as[Long].collect().toSeq
    assert(ids == (0L until 30L).toSeq)
  }

  test("streaming parser window stays bounded: many records parse off a tiny initial buffer") {
    // one container, 2000 records, each ~1 KiB: the container is ~2 MiB
    // but the RecordStream window never needs more than one record; this
    // pins the iterator against off-by-ones at buffer-growth boundaries
    // (records deliberately sized around the 64 KiB initial window)
    val bodies = (0 until 2000).map(i => s"payload $i " + ("y" * (i % 1500)))
    val container = bodies.zipWithIndex.map { case (b, i) =>
      rec(i.toLong, b)
    }.reduce(_ ++ _)
    val rows = Warc.parseFile("big", container)
    assert(rows.size == 2000 && rows.forall(_.error == null))
    assert(rows.map(_.body) == bodies)
    // offsets are exact byte positions
    assert(rows.head.offset == 0L)
    assert(rows.sliding(2).forall { case Seq(a, b) => b.offset > a.offset })
  }

  test("a corrupt header region quarantines at the 1 MiB cap instead of buffering the stream") {
    // magic + 2 MiB of header-less garbage (no \r\n\r\n anywhere), then a
    // valid record: without the MaxHeaderBytes cap the header-end scan
    // would grow the window over the whole remaining stream (the exact
    // one-record peak-heap contract this class exists for); with it, the
    // garbage record quarantines as unterminated and the resync still
    // finds the valid record behind it
    val garbage = Array.fill[Byte](2 << 20)('x'.toByte)
    val good = rec(7L, "survivor body")
    val container =
      ("WARC/1.0\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ++ garbage ++ good)
    val rows = Warc.parseFile("hdr", container)
    assert(rows.map(_.error).count(_ == "unterminated header") >= 1,
      s"expected an unterminated-header quarantine, got ${rows.map(_.error)}")
    val ok = rows.filter(_.error == null)
    assert(ok.size == 1 && ok.head.body == "survivor body",
      "the valid record behind the corrupt region must still parse")
  }

  test("a corrupt record costs itself, not its container: distributed quarantine routing") {
    val dir = Files.createTempDirectory("warc_q").toString
    val rows = (0L until 12L).map(i =>
      (i % 2, i, s"urn:graft:$i", s"https://h/p/$i", s"payload $i",
        if (i % 5 == 3) -3 else 0))
      .toDF("shard", "sort_key", "record_id", "target_uri", "body", "len_delta")
    Warc.writeSharded(spark, rows, s"$dir/warc", shards = 2)
    val all = Warc.read(spark, s"$dir/warc")
    val bad = Warc.quarantined(all)
    assert(bad.count() == 2L) // ids 3 and 8
    assert(bad.select("error").distinct().as[String].collect().toSeq ==
      Seq("trailer mismatch"))
    val goodIds = Warc.records(all)
      .select(regexp_extract(col("record_id"), "urn:graft:(\\d+)", 1).cast("long"))
      .as[Long].collect().toSet
    assert(goodIds == (0L until 12L).filter(i => i % 5 != 3).toSet)
  }
}
