package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalQueries

/** Pins for the oracle-checked multimodal metadata key: its byte/frame
  * arithmetic must agree with the binary plumbing in
  * graft.pipeline.Multimodal (same ceil-div chunking a payload pipeline
  * uses), and the content address must be the md5 of the exact payload
  * bytes.
  */
class MultimodalQueriesSpec extends SparkSpec {

  test("mm_binary_meta: byte counts, frame counts, and digests are consistent") {
    val rows = MultimodalQueries.queries("mm_binary_meta")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bytes = texts(id).getBytes("UTF-8")
      assert(r.getAs[Long]("n_bytes") == bytes.length)
      assert(r.getAs[Long]("n_frames") == (bytes.length + 255) / 256)
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      assert(r.getAs[String]("content_md5") == md)
      val head = texts(id).substring(0, math.min(12, texts(id).length))
      assert(r.getAs[String]("b64_head") ==
        java.util.Base64.getEncoder.encodeToString(head.getBytes("UTF-8")))
    }
  }

  test("multimodal decode plumbing and metadata key agree on chunk math") {
    import spark.implicits._
    val media = graft.pipeline.Multimodal.syntheticMedia(spark, 32)
    val frames = graft.pipeline.Multimodal.sampleFrames(media, 16, 1)
      .groupBy("media_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    media.collect().foreach { m =>
      // sampleFrames floors (full frames only); the metadata key ceils
      // (every byte belongs to a frame) — both derive from payload length
      val body = m.payload.length - 12
      assert(frames.getOrElse(m.media_id, 0L) == body / 16)
    }
  }
}
