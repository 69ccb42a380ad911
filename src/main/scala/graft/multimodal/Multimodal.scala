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
  * ===== STUB BOUNDARY =====
  * This container ships no image/audio codecs, so [[StubCodec]] is a
  * clearly-marked deterministic FAKE: it derives pseudo
  * width/height/duration from the blob bytes. The Spark-side plumbing —
  * schema, binary handling, partition iteration, batch shape — is real and
  * tested; swap [[StubCodec]] for a JNI/ffmpeg/ImageIO codec in production
  * and nothing else changes.
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

  /** STUB decoder — deterministic fake in place of a real codec (`???` in
    * spirit; returns data derived only from the bytes so tests are exact).
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

  /** Per-partition batch feature extraction (decode → features). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // one codec init per PARTITION, not per row — the point of the
      // mapPartitions batch shape
      it.map { m =>
        val (w, h, d) = StubCodec.decode(m.kind, m.bytes)
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
        // [STUB] real: decode → scale to width×height → re-encode. The
        // deterministic fake derives output bytes from (input, target dims)
        // so the plumbing is exactly testable.
        val seed = s"${StubCodec.checksum(m.bytes)}_${width}x$height"
        val out = java.security.MessageDigest.getInstance("MD5")
          .digest(seed.getBytes("UTF-8"))
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
}
