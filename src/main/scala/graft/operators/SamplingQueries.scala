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

  /** Temperature-reweighted language mixing (T = 2, target half the
    * corpus): the corpus is en-heavy, so flattening keeps low-resource
    * languages at a visibly higher acceptance rate than English — the
    * standard multilingual rebalancing step. Delegates to
    * `Sampling.temperature`; membership is data-derived but still a pure
    * integer-exact function of (doc_id, per-lang counts), so DuckDB
    * replays it bit-for-bit.
    */
  private def sampleTemperature(s: SparkSession, dir: String): DataFrame =
    Sampling.temperature(Tables.documents(s, dir),
        col("lang"), col("doc_id"), 0.5)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  /** Greedy corpus selection under a global token budget — the data-
    * selection step of training-set construction: rank docs best-first
    * and keep the prefix whose cumulative size fits the budget (here
    * 40% of total chars; chars stand in for tokens — the corpus has no
    * tokenizer column — and "best" is longest-first with doc_id ties).
    *
    * The SCALABLE global prefix sum: a naive `sum() OVER (ORDER BY …)`
    * is a single-partition window. Instead rows bucket by `n_chars DIV
    * 64` — a range bucketing of the SORT KEY itself, so bucket-descending
    * order is exactly global order (equal keys can't split across
    * buckets; the sample_shuffle hex-prefix trick, generalized to a
    * numeric key) — cumulate inside each bucket in parallel, and re-base
    * with per-bucket offsets from a tiny windowed aggregate. Membership
    * is the exact-integer cross-multiply `cum·5 ≤ total·2` — no float
    * division. The oracle states the naive single-window form; the hash
    * compare certifies the decomposition (the ScalableWindows
    * discipline, applied to corpus selection).
    */
  def tokenBudgetCore(documents: DataFrame): DataFrame = {
    val d = documents.select(col("doc_id"), col("n_chars"))
      .withColumn("bucket", expr("n_chars DIV 64"))
    // r15 (the revenue_deciles discipline, guide §2.4): total_chars =
    // Σ bsum rides the offsets table's OWN single-partition window stage
    // instead of a separate corpus-scan aggregate + its broadcast —
    // integer-exact (Σ over buckets of Σ n_chars ≡ Σ n_chars), one
    // corpus scan, two fewer jobs.
    val offsets = d.groupBy("bucket").agg(sum(col("n_chars")).as("bsum"))
      .withColumn("off",
        sum(col("bsum")).over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("bucket"))) - col("bsum"))
      .withColumn("total_chars",
        sum(col("bsum")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("bucket").as("ob"), col("off"), col("total_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(desc("n_chars"), col("doc_id"))
    d.join(broadcast(offsets), col("bucket") === col("ob"))
      .withColumn("cum", sum(col("n_chars")).over(w) + col("off"))
      .filter(col("cum") * 5 <= col("total_chars") * 2)
      .select(col("doc_id"), col("n_chars"), col("cum"))
  }

  private def sampleTokenBudget(s: SparkSession, dir: String): DataFrame =
    tokenBudgetCore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** Per-language epoch upsampling (cap 3): each language replicated
    * toward the largest language's row count — the UP-sampling half of
    * training mixture construction beside sample_temperature's
    * down-sampling. The corpus is en-heavy, so low-resource languages
    * land at 2-3 epochs (zh's 2.9 fractional epoch resolves per row by
    * hash) while en stays at 1. Delegates to `Sampling.epochs`; replica
    * counts are a pure integer-exact function of (doc_id, per-lang
    * counts), so DuckDB replays the replication bit-for-bit, fractional
    * epochs included.
    */
  private def sampleEpochs(s: SparkSession, dir: String): DataFrame =
    Sampling.epochs(Tables.documents(s, dir), col("lang"), col("doc_id"),
        cap = 3L)
      .select(col("doc_id"), col("lang"), col("n_replicas"), col("replica"))
      .orderBy(col("doc_id"), col("replica"))

  /** Deterministic ROUND-ROBIN INTERLEAVE across sources — the data-mix
    * SCHEDULE of training: reading the output in `pos` order visits the
    * sources strictly in rotation (doc k of source i sits at position
    * (k−1)·S + i−1), so a training run consumes a stable source mixture
    * from step one instead of whatever order the files landed in.
    * Position is a pure integer function of (per-source rank, source
    * index) — reproducible across engines, runs, and layouts like every
    * sampling key.
    *
    * The per-source rank is a global row_number per source — a
    * low-cardinality partition window (5 partitions forever, the
    * text_pack trap). Instead rows bucket by `doc_id DIV 4096` (a range
    * prefix of the per-source sort key, the token_budget discipline
    * applied WITHIN each source): rank inside each (source, bucket) cell
    * in parallel, re-base with per-source running offsets from a tiny
    * (source × buckets) aggregate whose window partitions by source.
    * The oracle states the naive per-source window; the hash compare
    * certifies the decomposition. At larger corpora the bucket width
    * scales with max(doc_id)/cores — the constant is a knob, not a cap.
    */
  def interleaveCore(documents: DataFrame): DataFrame = {
    val d = documents.select(col("doc_id"), col("source"))
      .withColumn("bucket", expr("doc_id DIV 4096"))
    val srcW = org.apache.spark.sql.expressions.Window.orderBy("source")
    // probed r15: deriving the source index from the (source, bucket)
    // aggregate does NOT reuse its exchange — column pruning strips the
    // unused bn from the derived branch, so the subtrees stop being
    // canonically equal and the plan re-scans anyway. The separate
    // lang-free groupBy(source) scan is the cheaper of the two shapes;
    // keep it.
    val sources = d.groupBy(col("source")).agg(count(lit(1)).as("__n"))
      .select(col("source").as("s_src"),
        row_number().over(srcW).cast("long").as("sidx"))
    val nSources = sources.agg(count(lit(1)).as("n_sources"))
    val offW = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("bucket")
    val offsets = d.groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("bn"))
      .withColumn("off", sum(col("bn")).over(offW) - col("bn"))
      .select(col("source").as("o_src"), col("bucket").as("ob"), col("off"))
    val rnW = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "bucket").orderBy("doc_id")
    d.join(broadcast(offsets),
        col("source") === col("o_src") && col("bucket") === col("ob"))
      .join(broadcast(sources), col("source") === col("s_src"))
      .crossJoin(broadcast(nSources))
      .withColumn("rn", row_number().over(rnW) + col("off"))
      .select(col("doc_id"), col("source"),
        ((col("rn") - 1) * col("n_sources") + col("sidx") - 1).as("pos"))
  }

  private def sampleInterleave(s: SparkSession, dir: String): DataFrame =
    interleaveCore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** CLASS-BALANCED downsampling — equalize every language at the
    * smallest class's size (the hard-balance companion of
    * sample_temperature's soft reweighting: a probe/eval set wants
    * exactly-equal strata, not a flattened distribution). Each class
    * keeps its `min-count` first docs in a deterministic md5 order
    * ("bal"-salted so the permutation is independent of
    * sample_shuffle's), so membership is reproducible across engines,
    * runs, and layouts, and reruns on a grown corpus evict only from
    * the tail of the new order.
    *
    * The per-class md5 rank reuses the shuffle-order machinery WITH the
    * class key: rank inside (lang, md5-prefix bucket) cells — 256
    * buckets per class, parallelism = classes × buckets at any scale,
    * never a 5-partition class window — re-based by a tiny broadcast
    * (lang × bucket) offset table. The oracle states the naive
    * per-class window; the hash compare certifies the decomposition.
    */
  def balancedCore(documents: DataFrame): DataFrame = {
    // explicit isnotnull(lang) at the base (r15): the equi-join below
    // infers this exact filter onto ITS branch of the shared (lang,
    // bucket) aggregate during optimization; stating it once here keeps
    // both branches canonically identical so the exchange is REUSED
    // instead of re-scanned. Null-lang rows never reach the output
    // either way (the equi-join drops them). The class TARGET below is
    // derived from this null-filtered aggregate, while the oracle's
    // min(count per lang) would see a NULL-lang group — equivalence
    // rests on lang being non-null in the fixtures (0 nulls at all
    // three SFs — ENFORCED by TablesContractSpec's fixture-invariant
    // test, r16).
    val h = documents
      .filter(col("lang").isNotNull)
      .select(col("doc_id"), col("lang"),
        md5(concat(lit("bal"), col("doc_id").cast("string")).cast("binary")).as("h"))
      .withColumn("bucket", substring(col("h"), 1, 2))
    val offW = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("bucket")
    val offsets0 = h.groupBy(col("lang"), col("bucket")).agg(count(lit(1)).as("bn"))
    // r15 (guide §2.4): the class target min(count per lang) derives
    // from the SAME (lang, bucket) aggregate the offsets use — Σ bn per
    // lang is exactly count per lang — so ReuseExchange serves both
    // consumers from one shuffle and the separate documents scan +
    // groupBy(lang) subtree disappears (one corpus scan, not two).
    val target = offsets0.groupBy(col("lang")).agg(sum(col("bn")).as("n"))
      .agg(min(col("n")).as("t"))
    val offsets = offsets0
      .withColumn("off", sum(col("bn")).over(offW) - col("bn"))
      .select(col("lang").as("ol"), col("bucket").as("ob"), col("off"))
    val rnW = org.apache.spark.sql.expressions.Window
      .partitionBy("lang", "bucket").orderBy(col("h"), col("doc_id"))
    h.join(broadcast(offsets),
        col("lang") === col("ol") && col("bucket") === col("ob"))
      .crossJoin(broadcast(target))
      .withColumn("rk", row_number().over(rnW).cast("long") + col("off"))
      .filter(col("rk") <= col("t"))
      .select(col("doc_id"), col("lang"), col("rk"))
  }

  private def sampleBalanced(s: SparkSession, dir: String): DataFrame =
    balancedCore(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_balanced" -> (sampleBalanced _),
    "sample_interleave" -> (sampleInterleave _),
    "sample_epochs" -> (sampleEpochs _),
    "sample_token_budget" -> (sampleTokenBudget _),
    "sample_temperature" -> (sampleTemperature _),
    "sample_shuffle"    -> (sampleShuffle _),
    "sample_hash"       -> (sampleHash _),
    "sample_stratified" -> (sampleStratified _),
    "sample_split"      -> (sampleSplit _),
    "sample_weighted"   -> (sampleWeighted _))

  // 0x-prefixed hex cast = Spark's conv(hex, 16, 10); thresholds are
  // round(fraction * 65536)
  val oracle: Map[String, String] = Map(
    // PORTABLE: md5/'||'/STRING alias/row_number all run unmodified on
    // both engines (probed); the naive per-class window here certifies
    // the bucketed decomposition in the Spark plan
    "sample_balanced" ->
      """WITH h AS (
        |  SELECT doc_id, lang, md5('bal' || CAST(doc_id AS STRING)) AS h
        |  FROM documents),
        |t AS (
        |  SELECT min(n) AS t FROM (
        |    SELECT count(*) AS n FROM documents GROUP BY lang) x),
        |r AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rk
        |  FROM h)
        |SELECT doc_id, lang, rk
        |FROM r CROSS JOIN t
        |WHERE rk <= t
        |ORDER BY doc_id""".stripMargin,
    // PORTABLE: plain row_number / distinct / cross join ANSI
    "sample_interleave" ->
      """WITH s AS (
        |  SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents) t),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM s),
        |r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |                            ORDER BY doc_id) AS BIGINT) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.source,
        |  (r.rn - 1) * ns.n_sources + s.sidx - 1 AS pos
        |FROM r JOIN s ON r.source = s.source CROSS JOIN ns
        |ORDER BY r.doc_id""".stripMargin,
    "sample_epochs" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |           FROM documents GROUP BY lang),
        |m AS (SELECT max(n) AS nmax FROM c),
        |e AS (SELECT c.lang, c.n, least(3 * c.n, m.nmax) AS ee
        |      FROM c CROSS JOIN m),
        |r AS (
        |  SELECT d.doc_id, d.lang,
        |    CAST(e.ee // e.n AS BIGINT)
        |      + CASE WHEN CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS INTEGER)
        |               * e.n < (e.ee % e.n) * 65536
        |             THEN 1 ELSE 0 END AS n_replicas
        |  FROM documents d JOIN e USING (lang))
        |SELECT doc_id, lang, n_replicas,
        |  CAST(u.replica AS BIGINT) AS replica
        |FROM r, unnest(range(1, n_replicas + 1)) AS u(replica)
        |ORDER BY doc_id, replica""".stripMargin,
    "sample_token_budget" ->
      """WITH t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total_chars
        |           FROM documents),
        |r AS (
        |  SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY n_chars DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM documents)
        |SELECT doc_id, n_chars, cum
        |FROM r CROSS JOIN t
        |WHERE cum * 5 <= total_chars * 2
        |ORDER BY doc_id""".stripMargin,
    "sample_temperature" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
        |  FROM documents GROUP BY lang),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS ntot,
        |             CAST(sum(w) AS BIGINT) AS sw FROM c)
        |SELECT d.doc_id, d.lang, d.source
        |FROM documents d JOIN c USING (lang) CROSS JOIN t
        |WHERE CAST(CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS INTEGER) AS HUGEINT)
        |        * t.sw * c.n
        |      < CAST(round(t.ntot * 0.5) AS HUGEINT) * c.w * 65536
        |ORDER BY d.doc_id""".stripMargin,
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
