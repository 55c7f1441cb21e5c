package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.pipeline.Sampling

/** SURVEY.md §2.9 — deterministic sampling / split assignment for
  * training-corpus construction (delegates to `graft.pipeline.Sampling`).
  *
  * `df.sample()` is partition-order-dependent and could never be
  * oracle-checked; these are hash-membership operators — membership is a
  * pure function of a stable key, so they are reproducible across
  * engines, runs, and cluster layouts (which is exactly why DuckDB can
  * replay them bit-for-bit), stable under corpus growth, and execute as
  * scan-level filters with no shuffle (the stratified variant is the one
  * rank≤k window Exchange).
  */
object SamplingQueries extends QueryPack {

  /** ~10% Bernoulli by md5 of doc_id: threshold 6554 of the 16-bit hash
    * space (round(0.1·65536)).
    */
  private def sampleHash(s: SparkSession, dir: String): DataFrame =
    Sampling.bernoulli(Tables.documents(s, dir), col("doc_id"), 0.1)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** 20 uniformly-chosen docs per language, deterministically. */
  private def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratified(Tables.documents(s, dir),
        col("lang"), col("doc_id"), col("doc_id"), 20)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))

  /** 80/10/10 train/val/test assignment; per (lang, split) profile so the
    * oracle checks both the assignment and its per-language balance.
    */
  private def sampleSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("split", Sampling.split(col("doc_id"), 0.8, 0.9))
      .groupBy(col("lang"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy(col("lang"), col("split"))

  /** Quality-weighted Bernoulli: keep probability n_chars/2000 (capped) —
    * longer docs are likelier survivors, the usual quality-weighted
    * subsetting. Membership is exact integer arithmetic (hash·cap vs
    * weight·65536), so there is no float threshold to drift cross-engine.
    */
  private def sampleWeighted(s: SparkSession, dir: String): DataFrame =
    Sampling.weighted(Tables.documents(s, dir),
        col("doc_id"), col("n_chars"), 2000L)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Deterministic global training shuffle: every doc gets its position
    * in the md5-ordered permutation — the epoch shuffle of a training
    * pipeline, reproducible across engines, runs, and layouts.
    *
    * The SCALABLE global rank: a global `row_number() OVER (ORDER BY h)`
    * is a single-partition window — the classic 100 TB killer. Instead,
    * bucket by the hash's first hex byte (a PREFIX of the sort key, so
    * bucket order ≡ hash order), rank inside each bucket in parallel,
    * and add per-bucket offsets from a 256-row cumulative table (its
    * window is over the tiny aggregate, never the corpus). Positions
    * are identical to the naive global window by construction; the
    * oracle states the naive form and the hash compare certifies the
    * decomposition.
    */
  def shuffleOrderCore(documents: DataFrame): DataFrame = {
    val h = documents
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bucket", substring(col("h"), 1, 2))
    val offsets = h.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("off",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .orderBy("bucket")) - col("n"))
      .select(col("bucket").as("ob"), col("off"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("h"), col("doc_id"))
    h.join(broadcast(offsets), col("bucket") === col("ob"))
      .select(col("doc_id"),
        (row_number().over(w).cast("long") + col("off")).as("pos"))
  }

  private def sampleShuffle(s: SparkSession, dir: String): DataFrame =
    shuffleOrderCore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_shuffle"    -> (sampleShuffle _),
    "sample_hash"       -> (sampleHash _),
    "sample_stratified" -> (sampleStratified _),
    "sample_split"      -> (sampleSplit _),
    "sample_weighted"   -> (sampleWeighted _))

  // 0x-prefixed hex cast = Spark's conv(hex, 16, 10); thresholds are
  // round(fraction * 65536)
  val oracle: Map[String, String] = Map(
    "sample_shuffle" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pos
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "sample_hash" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) < 6554
        |ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 20
        |ORDER BY lang, doc_id""".stripMargin,
    "sample_weighted" ->
      """SELECT doc_id, lang, n_chars
        |FROM documents
        |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) * 2000
        |      < CAST(n_chars AS BIGINT) * 65536
        |ORDER BY doc_id""".stripMargin,
    "sample_split" ->
      """SELECT lang,
        |  CASE WHEN h < 52429 THEN 'train'
        |       WHEN h < 58982 THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  round(avg(n_chars), 2) AS avg_chars
        |FROM (SELECT lang, n_chars,
        |        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) AS h
        |      FROM documents) t
        |GROUP BY lang, split
        |ORDER BY lang, split""".stripMargin)
}
