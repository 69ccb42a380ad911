package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String, String)*) = {
    import Multimodal.MediaRecord
    rows.map { case (id, kind, s) => MediaRecord(id, kind, s.getBytes("UTF-8")) }.toDS()
  }

  test("extractFeatures: unparseable blobs take the deterministic quarantine path") {
    val ds = media((1L, "image", "abc"), (2L, "audio", "defg"))
    val out1 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    val out2 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq) // determinism across runs
    assert(out1.map(_.n_bytes).toSeq == Seq(3L, 4L))
    assert(out1.forall(f => f.width >= 64 && f.height >= 64)) // quarantine marker dims
    assert(out1.head.duration_ms == 0L) // image: no duration
    assert(out1(1).duration_ms >= 0L)   // audio: quarantine duration
    assert(out1.head.checksum == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("truncated PNG (magic intact, body cut) quarantines instead of failing the task") {
    import Multimodal.MediaRecord
    val good = Multimodal.ImageCodec.encodePng(16, 16, seed = 3L)
    val truncated = good.take(good.length / 4) // PNG signature survives, IDAT doesn't
    // ImageIO.read THROWS here rather than returning null — the decode
    // guard must turn that into the quarantine path (10x stress finding)
    assert(Multimodal.ImageCodec.decode(truncated).isEmpty)
    assert(Multimodal.ImageCodec.resizePng(truncated, 4, 4).isEmpty)
    val out = Multimodal.extractFeatures(
      Seq(MediaRecord(1L, "image", truncated)).toDS()).collect()
    assert(out.length == 1 && out.head.width >= 64) // quarantine marker dims
  }

  test("sampleFrames: unparseable video quarantines to byte-slice checksums; non-video dropped") {
    val ds = media((1L, "video", "0123456789abcdef"), (2L, "image", "xyz"))
    val out = Multimodal.sampleFrames(ds, 4)
      .as[(Long, Int, Int, Int, Int, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out.size == 4)
    assert(out.map(_._2) == Seq(0, 1, 2, 3))
    assert(out.forall(r => r._3 == 0 && r._4 == 0 && r._5 == 0)) // quarantine: unknown count, no dims
    assert(out.map(_._7).distinct.size == 4) // distinct slices -> distinct checksums
    // blobs shorter than maxFrames emit one row per byte (disjoint slices,
    // no repeated checksums of the same window); empty blobs exactly one row
    val tiny = Multimodal.sampleFrames(media((3L, "video", "ab"), (4L, "video", "")), 4)
      .as[(Long, Int, Int, Int, Int, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    val (twoByte, empty) = tiny.partition(_._1 == 3L)
    assert(twoByte.size == 2 && twoByte.map(_._7).distinct.size == 2, twoByte.toString)
    assert(empty.size == 1, empty.toString)
  }

  test("corrupt/truncated video blobs never fail the task: salvage or quarantine") {
    import Multimodal.MediaRecord
    val good = Multimodal.GifCodec.encodeGif(8, 8, nFrames = 6, delayCs = 10, seed = 1L)
    // a frame index past the container must yield None, not a thrown
    // IndexOutOfBounds — this is the path the old `.get` would crash on
    assert(Multimodal.GifCodec.decodeFrames(good, Seq(0, 99)).isEmpty)
    // a mid-stream truncation: the GIF reader salvages the intact frame
    // prefix (probe reports only complete frames), so sampleFrames must
    // emit EITHER consistent salvaged rows or quarantine rows — and never
    // throw
    val truncated = good.take(good.length / 2)
    val ds = Seq(MediaRecord(1L, "video", truncated)).toDS()
    val out = Multimodal.sampleFrames(ds, 4)
      .as[(Long, Int, Int, Int, Int, Long, String)].collect().toSeq
    assert(out.nonEmpty)
    val salvaged = out.forall(r => r._3 > 0 && r._4 == 8 && r._5 == 8)
    val quarantined = out.forall(r => r._3 == 0 && r._4 == 0 && r._5 == 0)
    assert(salvaged || quarantined, out.toString)
  }

  test("AudioCodec: WAV encode → decode round-trips the exact duration") {
    val wav = Multimodal.AudioCodec.encodeWav(725L, seed = 9L)
    // a real RIFF/WAVE container: magic bytes + parseable + exact duration
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(Multimodal.AudioCodec.decodeDurationMs(wav).contains(725L))
    assert(Multimodal.AudioCodec.decodeDurationMs("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("AudioCodec: a truncated WAV quarantines instead of reporting the declared duration") {
    val wav = Multimodal.AudioCodec.encodeWav(725L, seed = 9L)
    // the JDK parser trusts the header: a quarter-truncated blob still
    // "parses" and reports the full 725 ms unless the decoder checks the
    // declared PCM length against the bytes actually present
    assert(Multimodal.AudioCodec.decodeDurationMs(wav.take(wav.length / 4)).isEmpty,
      "truncated audio must take the quarantine path, not report healthy metadata")
    // the overflow guard: unencodable durations fail loudly, not with a
    // NegativeArraySizeException from a wrapped frame count
    intercept[IllegalArgumentException] {
      Multimodal.AudioCodec.encodeWav(300000000L, seed = 1L)
    }
  }

  test("GifCodec: multi-frame encode → probe/decode round-trips count, dims, duration") {
    val gif = Multimodal.GifCodec.encodeGif(9, 6, nFrames = 5, delayCs = 10, seed = 3L)
    assert(new String(gif.slice(0, 3), "US-ASCII") == "GIF")
    assert(Multimodal.GifCodec.probe(gif).contains((5, 9, 6, 500L)))
    // per-frame decode reads real rasters: right dims, distinct pixel content
    val frames = (0 until 5).map(i => Multimodal.GifCodec.decodeFrame(gif, i).get)
    assert(frames.forall(f => f._1 == 9 && f._2 == 6))
    assert(frames.map(_._3).distinct.size == 5)
    assert(Multimodal.GifCodec.probe("not a gif".getBytes("UTF-8")).isEmpty)
    // a PNG is image-reader-parseable but NOT a gif: the probe must refuse
    assert(Multimodal.GifCodec.probe(Multimodal.ImageCodec.encodePng(4, 4, 1L)).isEmpty)
  }

  test("extractFeatures decodes REAL durations from synthesized WAVs (id-keyed formula)") {
    val df = Seq(0L, 7L, 123L).toDF("doc_id")
    val out = Multimodal.extractFeatures(Multimodal.synthesizeAudio(df, "doc_id"))
      .collect().sortBy(_.media_id)
    out.foreach { f =>
      assert(f.duration_ms == 100L + 25L * (f.media_id % 48), s"duration of ${f.media_id}")
      assert(f.kind == "audio" && f.width == 0 && f.height == 0)
      assert(f.n_bytes > f.duration_ms * 16L) // real PCM payload + header
    }
  }

  test("sampleFrames decodes REAL frames from synthesized GIFs (id-keyed formula)") {
    val df = Seq(0L, 7L, 123L).toDF("doc_id")
    val out = Multimodal.sampleFrames(Multimodal.synthesizeVideos(df, "doc_id"), 8)
      .as[(Long, Int, Int, Int, Int, Long, String)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    val byId = out.groupBy(_._1)
    for ((id, rows) <- byId) {
      val nf = 2 + (id % 7).toInt
      assert(rows.size == nf)
      assert(rows.map(_._2) == (0 until nf))
      assert(rows.forall(r => r._3 == nf))
      assert(rows.forall(r => r._4 == 4 + (id % 13).toInt && r._5 == 4 + (id % 11).toInt))
      assert(rows.forall(r => r._6 == nf * 100L))
      assert(rows.map(_._7).distinct.size == nf) // distinct per-frame rasters
    }
  }

  test("resize keeps the opaque-blob schema and is deterministic per (input, dims)") {
    val ds = media((1L, "image", "abc"), (2L, "image", "def"))
    val out = Multimodal.resize(ds, 224, 224)
      .as[(Long, String, Int, Int, Array[Byte])].collect().sortBy(_._1)
    assert(out.map(r => (r._2, r._3, r._4)).forall(_ == (("image", 224, 224))))
    assert(out.forall(_._5.length == 16))
    assert(!out(0)._5.sameElements(out(1)._5)) // distinct inputs -> distinct blobs
    val again = Multimodal.resize(ds, 224, 224)
      .as[(Long, String, Int, Int, Array[Byte])].collect().sortBy(_._1)
    assert(out.zip(again).forall { case (a, b) => a._5.sameElements(b._5) })
  }

  test("fromText builds 16-byte binary blobs from md5") {
    val df = Seq((7L, "hello world")).toDF("doc_id", "text")
    val rec = Multimodal.fromText(df, "doc_id", "text", "image").collect().head
    assert(rec.media_id == 7L && rec.kind == "image" && rec.bytes.length == 16)
  }

  test("ImageCodec: encode → decode round-trips real pixel dimensions") {
    val png = Multimodal.ImageCodec.encodePng(13, 7, seed = 5L)
    // a real PNG: magic bytes, parseable, and the decoded grid is 13×7
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    assert(Multimodal.ImageCodec.decode(png).contains((13, 7)))
    assert(Multimodal.ImageCodec.decode("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("ImageCodec: resize produces a decodable PNG at the target dims") {
    val png = Multimodal.ImageCodec.encodePng(20, 10, seed = 1L)
    val resized = Multimodal.ImageCodec.resizePng(png, 5, 4).get
    assert(Multimodal.ImageCodec.decode(resized).contains((5, 4)))
  }

  test("extractFeatures decodes REAL dims from synthesized PNGs (id-keyed formula)") {
    val df = Seq(0L, 7L, 123L).toDF("doc_id")
    val out = Multimodal.extractFeatures(Multimodal.synthesizeImages(df, "doc_id"))
      .collect().sortBy(_.media_id)
    out.foreach { f =>
      assert(f.width == 4 + (f.media_id % 29).toInt, s"width of ${f.media_id}")
      assert(f.height == 4 + (f.media_id % 31).toInt, s"height of ${f.media_id}")
      assert(f.duration_ms == 0L && f.kind == "image")
      assert(f.n_bytes > 50L) // a real PNG container, not a 16-byte digest
    }
  }

  test("resize on a real PNG blob actually rescales the image") {
    val df = Seq(42L).toDF("doc_id")
    val ds = Multimodal.synthesizeImages(df, "doc_id")
    val out = Multimodal.resize(ds, 6, 9)
      .as[(Long, String, Int, Int, Array[Byte])].collect().head
    assert(Multimodal.ImageCodec.decode(out._5).contains((6, 9)))
  }
}
