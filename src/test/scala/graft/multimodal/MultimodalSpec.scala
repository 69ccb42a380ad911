package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: (Long, String, String)*) = {
    import Multimodal.MediaRecord
    rows.map { case (id, kind, s) => MediaRecord(id, kind, s.getBytes("UTF-8")) }.toDS()
  }

  test("extractFeatures: deterministic stub features, one row per blob") {
    val ds = media((1L, "image", "abc"), (2L, "audio", "defg"))
    val out1 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    val out2 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq) // determinism across runs
    assert(out1.map(_.n_bytes).toSeq == Seq(3L, 4L))
    assert(out1.forall(f => f.width >= 64 && f.height >= 64))
    assert(out1.head.duration_ms == 0L) // image: no duration
    assert(out1(1).duration_ms >= 0L)   // audio: stub duration
    assert(out1.head.checksum == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("sampleFrames: n frames per video, none for other kinds") {
    val ds = media((1L, "video", "0123456789abcdef"), (2L, "image", "xyz"))
    val out = Multimodal.sampleFrames(ds, 4)
      .as[(Long, Int, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out.size == 4)
    assert(out.map(_._2) == Seq(0, 1, 2, 3))
    assert(out.map(_._3).distinct.size == 4) // distinct slices -> distinct checksums
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
