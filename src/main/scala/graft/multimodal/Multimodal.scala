package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media are OPAQUE `binary` columns plus typed metadata, exactly as a
  * 100 TB lake stores them; decode / feature-extraction runs per-partition
  * so each task touches only its partition's blobs (the Scala analogue of
  * `mapInPandas` batch UDFs — iterator in, iterator out, no per-row
  * serialization round trip and no driver involvement).
  *
  * ===== STUB BOUNDARY (audio/video ONLY) =====
  * Image decode/resize is REAL: [[ImageCodec]] rides `javax.imageio`,
  * which ships in the JDK — PNG blobs are actually parsed and their
  * pixel dimensions actually decoded. Audio/video duration still goes
  * through [[StubCodec]], a clearly-marked deterministic FAKE (this
  * container ships no audio/video codec); swap it for an ffmpeg/JNI
  * binding in production and nothing else changes.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, kind: String, bytes: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** REAL image codec over `javax.imageio` (in the JDK — no external jar).
    * Encode, decode and resize operate on actual PNG bytes and actual
    * pixels.
    */
  object ImageCodec {

    /** Deterministic synthetic PNG: a width×height gradient keyed by
      * `seed`. Real encode — the bytes are a spec-conformant PNG any
      * decoder parses.
      */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val rgb = (((x * 7 + y * 13 + seed) % 256).toInt << 16) |
            (((x * 3 + seed) % 256).toInt << 8) | ((y * 5 + seed) % 256).toInt
          img.setRGB(x, y, rgb)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real decode: parse the blob, return (width, height) from the pixel
      * grid. None when the bytes aren't a parseable image.
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int)] =
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        .map(img => (img.getWidth, img.getHeight))

    /** Real resize: decode → bilinear scale to width×height → PNG
      * re-encode. None when the input bytes aren't a parseable image.
      */
    def resizePng(bytes: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))).map { src =>
        val dst = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, width, height, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
  }

  /** STUB decoder — deterministic fake in place of a real AUDIO/VIDEO codec
    * (`???` in spirit; returns data derived only from the bytes so tests
    * are exact). Image blobs do NOT go through this — see [[ImageCodec]].
    */
  object StubCodec {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Long) = {
      // [STUB] a real implementation would parse the container format here
      val h = bytes.foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
      val width = 64 + math.floorMod(h, 1024L).toInt
      val height = 64 + math.floorMod(h >> 10, 1024L).toInt
      val durationMs = if (kind == "audio" || kind == "video") math.floorMod(h >> 20, 600000L) else 0L
      (width, height, durationMs)
    }

    def checksum(bytes: Array[Byte]): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(bytes).map("%02x".format(_)).mkString
    }
  }

  /** Per-partition batch feature extraction (decode → features). Image
    * dimensions come from a REAL [[ImageCodec]] decode of the blob's pixel
    * grid; audio/video duration is the [[StubCodec]] stand-in (no JDK
    * codec); unparseable image bytes also fall back to the stub rather
    * than failing the batch (the lake-hygiene behavior: quarantine-grade
    * metadata beats a dead pipeline).
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one codec init per PARTITION, not per row — the point of the
      // mapPartitions batch shape
      it.map { m =>
        val (w, h, d) = if (m.kind == "image") {
          ImageCodec.decode(m.bytes) match {
            case Some((rw, rh)) => (rw, rh, 0L)
            case None           => StubCodec.decode(m.kind, m.bytes)
          }
        } else StubCodec.decode(m.kind, m.bytes)
        MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong, StubCodec.checksum(m.bytes), w, h, d)
      }
    }
  }

  /** Per-partition batch resize: the preprocessing transform a vision
    * training pipeline runs on every image. The output is a new binary
    * column (plus the target dims) so the resized lake keeps the same
    * opaque-blob schema contract as the input.
    */
  def resize(media: Dataset[MediaRecord], width: Int, height: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val out = (if (m.kind == "image") ImageCodec.resizePng(m.bytes, width, height)
                   else None).getOrElse {
          // [STUB] non-image kinds (and unparseable blobs): deterministic
          // fake bytes derived from (input, target dims) so the plumbing
          // stays exactly testable without an audio/video codec.
          val seed = s"${StubCodec.checksum(m.bytes)}_${width}x$height"
          java.security.MessageDigest.getInstance("MD5").digest(seed.getBytes("UTF-8"))
        }
        (m.media_id, m.kind, width, height, out)
      }
    }.toDF("media_id", "kind", "width", "height", "bytes")
  }

  /** Deterministic frame sampling for video blobs: n evenly-spaced "frames"
    * (stub: each frame is a checksum of its byte slice). Output explodes to
    * one row per frame — the shape a caption/embedding stage consumes.
    */
  def sampleFrames(media: Dataset[MediaRecord], nFrames: Int): DataFrame = {
    import media.sparkSession.implicits._
    media
      .filter(_.kind == "video")
      .flatMap { m =>
        val step = math.max(1, m.bytes.length / nFrames)
        (0 until nFrames).iterator.map { i =>
          val from = math.min(i * step, math.max(0, m.bytes.length - 1))
          val until = math.min(from + step, m.bytes.length)
          // [STUB] real: decode frame at timestamp i/nFrames * duration
          (m.media_id, i, StubCodec.checksum(m.bytes.slice(from, until)))
        }
      }
      .toDF("media_id", "frame_idx", "frame_checksum")
  }

  /** Build a MediaRecord dataset from any table with an id and a string
    * payload (the offline stand-in for reading a binary lake column).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, kind: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(
        col(idCol).cast("long").as("media_id"),
        lit(kind).as("kind"),
        to_binary(md5(col(textCol)), lit("hex")).as("bytes"))
      .as[MediaRecord]
  }

  /** Synthesize REAL PNG blobs keyed by an id column: each record's image
    * is `(4 + id mod 29) × (4 + id mod 31)` pixels, actually encoded by
    * [[ImageCodec]]. The id-derived dimensions make the downstream decode
    * verifiable by formula — an oracle can predict exactly what a correct
    * decoder must read back out of the pixel grid. (The offline stand-in
    * for an image-bearing lake table; encoding runs per-partition like
    * every other codec pass.)
    */
  def synthesizeImages(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 4 + math.floorMod(id, 29L).toInt
        val h = 4 + math.floorMod(id, 31L).toInt
        MediaRecord(id, "image", ImageCodec.encodePng(w, h, id))
      }
    }
  }
}
