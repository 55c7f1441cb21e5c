package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One packed document: its group, token count, and assigned bin. */
case class PackedDoc(source: String, doc_id: Long, n_tokens: Long, bin_id: Long)

/** Sequence packing — greedy token-budget bin packing of documents into
  * fixed-capacity training sequences, the batching step every LLM data
  * pipeline runs between tokenization and training.
  *
  * Two forms with an explicit trade:
  *
  *  - [[packGreedy]] is the EXACT sequential greedy fold per group
  *    (first-fit in doc_id order; a doc that does not fit closes the
  *    bin; an oversized doc gets a bin alone). Implemented with
  *    `flatMapSortedGroups` — Spark's secondary sort hands each group's
  *    iterator already ordered, so the fold is O(1) memory and never
  *    collects a group. Parallelism = number of groups: fine when the
  *    group key is high-cardinality, a documented low-cardinality trap
  *    otherwise (same caveat family as the naive window forms, §7.7).
  *
  *  - [[packChunked]] is the scale path: docs are packed in independent
  *    (group, chunk) sub-ranges — bins never cross a chunk boundary —
  *    then bin ids are re-based globally with one tiny window over the
  *    per-chunk bin counts. Embarrassingly parallel, result fully
  *    deterministic, and the cost is bounded waste: at most one
  *    under-filled bin per chunk, so n_bins(chunked) ≤ n_bins(exact) +
  *    n_chunks. This bins-within-partition compromise is what real
  *    100 TB packing jobs run; the exact form is the oracle-checked
  *    semantic anchor.
  *
  * Expects (source, doc_id, n_tokens) columns; both forms are pure
  * integer arithmetic — no floats, bit-identical on any engine.
  */
object Packing {

  /** The greedy fold shared by both forms: assign each (doc_id, n) to a
    * bin, starting a new bin when the doc does not fit a NON-EMPTY bin.
    */
  private def fold(docs: Iterator[(Long, Long)], budget: Long,
                   src: String): Iterator[PackedDoc] = {
    var bin = 0L; var fill = 0L
    docs.map { case (id, n) =>
      if (fill > 0 && fill + n > budget) { bin += 1; fill = 0L }
      fill += n
      PackedDoc(src, id, n, bin)
    }
  }

  /** Exact greedy packing per source in doc_id order. */
  def packGreedy(docs: DataFrame, budget: Long): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source"), col("doc_id").cast("long"),
        col("n_tokens").cast("long")).as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("doc_id")) { (src, it) =>
        fold(it.map(t => (t._2, t._3)), budget, src)
      }
  }

  /** Chunked packing: greedy within (source, doc_id DIV chunkSize),
    * bins never cross chunks, then global per-source bin numbering via
    * a cumulative count over the tiny (source, chunk) summary table.
    */
  def packChunked(docs: DataFrame, budget: Long, chunkSize: Long): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val local = docs.select(col("source"), col("doc_id").cast("long"),
        col("n_tokens").cast("long"),
        expr(s"CAST(doc_id AS BIGINT) DIV $chunkSize").as("chunk"))
      .as[(String, Long, Long, Long)]
      .groupByKey(t => (t._1, t._4))
      .flatMapSortedGroups(col("doc_id")) { (key, it) =>
        fold(it.map(t => (t._2, t._3)), budget, key._1)
          .map(p => (p.source, key._2, p.doc_id, p.n_tokens, p.bin_id))
      }
      .toDF("source", "chunk", "doc_id", "n_tokens", "local_bin")
    // re-base: bins used by every earlier chunk of the same source. The
    // summary is one row per (source, chunk) — window cost is trivial
    // next to the fact, and ReuseExchange shares the local scan.
    val w = Window.partitionBy("source").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("source"), col("chunk"))
      .agg((max(col("local_bin")) + 1).as("n_bins"))
      .withColumn("base", coalesce(sum("n_bins").over(w), lit(0L)))
      .select(col("source").as("o_source"), col("chunk").as("o_chunk"), col("base"))
    local.join(broadcast(offsets),
        col("source") === col("o_source") && col("chunk") === col("o_chunk"))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        (col("base") + col("local_bin")).as("bin_id"))
      .as[PackedDoc]
  }
}
