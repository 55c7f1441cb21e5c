package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (SURVEY.md §2.9).
  *
  * The container has no image/audio codecs, so `decodeImage` is a
  * clearly-marked DETERMINISTIC FAKE that parses our own 12-byte header
  * (written by `fakeImage`). Everything around it — the schema, the
  * Dataset[T] encoders, the mapPartitions batch shape (one decoder init
  * per partition, streamed rows), the partitioning — is the real
  * production plumbing: swapping in a JPEG decoder changes only the body
  * of `decodePayload`.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata alongside. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  case class DecodedImage(media_id: Long, width: Int, height: Int,
                          channels: Int, n_bytes: Long, mean_px: Double)

  /** Deterministic fake payload: 12-byte header (w, h, c as 4-byte BE
    * ints) + (w*h*c) pseudo-random bytes seeded by media_id.
    */
  def fakeImage(mediaId: Long, w: Int, h: Int, c: Int = 3): Array[Byte] = {
    val header = java.nio.ByteBuffer.allocate(12).putInt(w).putInt(h).putInt(c).array()
    val body = new Array[Byte](w * h * c)
    var seed = mediaId * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < body.length) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      body(i) = (seed >>> 56).toByte
      i += 1
    }
    header ++ body
  }

  /** STUB — the real codec goes here; header parse + pixel mean stand in
    * for decode so the pipeline shape is testable without codecs.
    */
  private def decodePayload(id: Long, payload: Array[Byte]): DecodedImage = {
    val bb = java.nio.ByteBuffer.wrap(payload)
    val (w, h, c) = (bb.getInt, bb.getInt, bb.getInt)
    var sum = 0L
    var i = 12
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    DecodedImage(id, w, h, c, payload.length.toLong,
      if (payload.length > 12) sum.toDouble / (payload.length - 12) else 0.0)
  }

  /** Batch decode: mapPartitions so per-partition decoder state (codec
    * contexts, model sessions) is initialised once per task, not per row —
    * the shape that matters when each partition holds thousands of
    * multi-MB payloads.
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec context, arena buffer)
      rows.filter(_.kind == "image").map(r => decodePayload(r.media_id, r.payload))
    }
  }

  /** Frame sampling for video-shaped payloads: every nth chunk of
    * `frameBytes` as its own row — the explode-without-decode pattern.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int, everyNth: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val nFrames = math.max(0, (r.payload.length - 12) / frameBytes)
      (0 until nFrames by everyNth).map { f =>
        val from = 12 + f * frameBytes
        (r.media_id, f, r.payload.slice(from, from + frameBytes))
      }
    }.toDF("media_id", "frame_no", "frame")
  }

  /** Synthesize a media table (the container ships no binary fixtures). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long]
      .map(i => MediaRecord(i, if (i % 4 == 3) "audio" else "image",
        fakeImage(i, 8 + (i % 5).toInt, 6 + (i % 3).toInt)))
  }
}
