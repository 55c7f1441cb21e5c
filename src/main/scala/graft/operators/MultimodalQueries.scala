package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** SURVEY.md §2.9 — multimodal-column plumbing, oracle-checked.
  *
  * The container ships no binary fixtures, so the opaque payload is
  * manufactured deterministically INSIDE the query from real testdata:
  * `encode(text, 'UTF-8')` stands in for the media blob. Everything a
  * multimodal pipeline does BEFORE decode is then real and verified
  * cross-engine: payload sizing (`octet_length`), chunk/frame counting
  * (ceil-div on bytes — the `sampleFrames` arithmetic from
  * graft.pipeline.Multimodal), content addressing (md5), and a bounded
  * head preview (base64 of the first 12 characters' bytes). The decode
  * itself — `Multimodal.decodeImages`/`decodeAudio`, real PPM/BMP/WAV
  * codecs behind a magic-byte dispatch (mapPartitions, one codec init
  * per partition) — is golden-tested in MultimodalQueriesSpec; it has
  * no oracle row because DuckDB cannot decode image payloads.
  *
  * Scale shape: single scan, per-row expressions only — no shuffle until
  * the final presentation sort, which a real pipeline wouldn't have.
  */
object MultimodalQueries extends QueryPack {

  private def mmBinaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("payload"),
        substring(col("text"), 1, 12).as("head"))
      .select(
        col("doc_id"), col("lang"),
        // long, not int: DuckDB's octet_length is BIGINT and the compare
        // is schema-sensitive
        length(col("payload")).cast("long").as("n_bytes"),
        // frames of 256 bytes, last one ragged: ceil-div in exact ints
        expr("CAST((length(payload) + 255) DIV 256 AS BIGINT)").as("n_frames"),
        base64(encode(col("head"), "UTF-8")).as("b64_head"),
        md5(col("payload")).as("content_md5"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta _))

  val oracle: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, lang,
        |  octet_length(encode(text)) AS n_bytes,
        |  (octet_length(encode(text)) + 255) // 256 AS n_frames,
        |  to_base64(encode(substr(text, 1, 12))) AS b64_head,
        |  md5(text) AS content_md5
        |FROM documents
        |ORDER BY doc_id""".stripMargin)
}
