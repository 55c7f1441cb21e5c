package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** Scale-safe twins of window queries whose PARTITION BY key has low
  * cardinality (SURVEY.md §7.7). A plain `Window.partitionBy(event_type)`
  * over 5 event types executes as 5 partitions no matter how many
  * executors the cluster has — at 100 TB those 5 sorts are the job. The
  * two decompositions here recover data-proportional parallelism while
  * staying EXACTLY result-identical to the naive window (spec-verified,
  * and both ship as oracle keys against the same DuckDB SQL):
  *
  *  - [[trailingRows]]: sub-chunk the order axis; interior rows compute
  *    frames entirely inside their (key, chunk) sub-partition, and only a
  *    tiny head/tail boundary set (≤ 2·lookback rows per chunk) is
  *    re-windowed globally — the one low-cardinality window left runs
  *    over O(lookback · chunks) rows, not the data.
  *  - [[trailingRangeSumCount]]: bucket the value axis; a width-W trailing
  *    RANGE frame decomposes into an in-bucket prefix, a run of whole
  *    buckets (two lookups into a cumulative per-bucket table), and a
  *    suffix of the bucket holding the frame's lower edge (a forward
  *    as-of join keyed by (key, bucket) — high cardinality).
  */
object ScalableWindows {

  /** Exact trailing-ROWS-frame window (`ROWS BETWEEN lookback PRECEDING
    * AND CURRENT ROW`) over a low-cardinality partition key, parallelized
    * by chunking the order axis.
    *
    * Interior rows (in-chunk position > lookback) have their whole frame
    * inside the chunk, so the frame over (partCols, chunk) equals the
    * global frame. Boundary rows — the first `lookback` of each chunk
    * (which need cross-chunk frames) plus the last `lookback` (their
    * context) — form a closed set: walking `lookback` rows back from any
    * head row can only cross tails and earlier heads, never a chunk
    * interior, for ANY chunk sizes (a sparse or tiny chunk contributes
    * all its rows as both head and tail). The global re-window therefore
    * runs on O(2·lookback) rows per chunk — at 1M rows/key and 2000-row
    * chunks that is 4k rows, not 1M.
    *
    * @param chunk  integral chunk id, MONOTONE NON-DECREASING along
    *               `orderCols` within each key (e.g. `col("event_id") /
    *               2000` when ordering by event_id) — chunks must be
    *               contiguous runs of the global order or frames lose
    *               rows. Chunk ids need not be consecutive integers, and
    *               chunk sizes may be ragged or smaller than the
    *               lookback; finer chunks = more parallelism
    * @param build  the frame aggregates, written once and applied to both
    *               passes' WindowSpecs — so the twin can never drift from
    *               the naive formulation
    */
  def trailingRows(df: DataFrame, partCols: Seq[String], orderCols: Seq[String],
                   chunk: Column, lookback: Int)
                  (build: WindowSpec => Seq[Column]): DataFrame = {
    require(lookback >= 1, "lookback must be >= 1")
    val out = df.columns.toSeq
    val sub = (partCols :+ "__chunk").map(col)
    val asc = orderCols.map(col(_).asc)
    val desc = orderCols.map(col(_).desc)
    val tagged = df.withColumn("__chunk", chunk.cast("long"))
      .withColumn("__head", row_number().over(
        Window.partitionBy(sub: _*).orderBy(asc: _*)) <= lookback)
      .withColumn("__tail", row_number().over(
        Window.partitionBy(sub: _*).orderBy(desc: _*)) <= lookback)
    // pass 1 — interior rows: frame fully in-chunk; (partCols, chunk) keys
    // give data-proportional parallelism. Window BEFORE the filter: frames
    // must see the chunk's head rows as context.
    val innerW = Window.partitionBy(sub: _*).orderBy(asc: _*)
      .rowsBetween(-lookback, Window.currentRow)
    val interior = tagged
      .select((out.map(col) ++ build(innerW)) :+ col("__head"): _*)
      .filter(!col("__head")).drop("__head")
    // pass 2 — boundary rows only: filter BEFORE the window (the subset is
    // frame-closed for head rows), then the one low-cardinality window
    // runs over ≤ 2·lookback rows per chunk. Tail-only rows are context;
    // their (wrong-on-this-subset) frames are discarded.
    val boundaryW = Window.partitionBy(partCols.map(col): _*).orderBy(asc: _*)
      .rowsBetween(-lookback, Window.currentRow)
    val boundary = tagged.filter(col("__head") || col("__tail"))
      .select((out.map(col) ++ build(boundaryW)) :+ col("__head"): _*)
      .filter(col("__head")).drop("__head")
    interior.unionByName(boundary)
  }

  /** Exact trailing RANGE-frame sum+count (`RANGE BETWEEN band PRECEDING
    * AND CURRENT ROW` ordered by an integral unit column), parallelized by
    * bucketing the value axis. All arithmetic is integral — no
    * float-association drift vs the naive window.
    *
    * For a row at value v in bucket b = ⌊v/bucketWidth⌋ the frame
    * [v−band, v] splits into:
    *   1. in-bucket prefix: in-bucket rows ≤ v (all are ≥ v−band because
    *      the frame's lower edge falls strictly below bucket b — this is
    *      why bucketWidth ≤ band is required);
    *   2. whole buckets strictly between b and lob = ⌊(v−band)/bucketWidth⌋:
    *      cum(b−1) − cum(lob) from a cumulative per-bucket table over
    *      OCCUPIED buckets only (one row per key×occupied bucket). The
    *      referenced ids b−1 / lob may name empty buckets; they resolve
    *      through a backward as-of over a tiny distinct-ids table —
    *      empty buckets contribute 0, so cum(largest occupied id ≤ x)
    *      equals a densified cum(x) exactly — and the fact-table lookups
    *      stay broadcast equi-joins. (Never densify the bucket axis with
    *      `sequence`: its length scales with value-range/bucketWidth,
    *      not data, so one outlier row could blow past the 2^31 sequence
    *      cap in a module advertised as scale-safe.)
    *   3. the lower-edge bucket's suffix at threshold v−band: a forward
    *      as-of join keyed by (partCols, lob) — bucket cardinality, so the
    *      one shuffle of the fact table is wide.
    *
    * Parallelism is (keys × valueRange/bucketWidth) — a knob independent
    * of data volume; shrink bucketWidth until it exceeds the cluster's
    * core count. (Unit column magnitudes must stay below 2^52 so the
    * bucket division is exact in doubles.)
    */
  def trailingRangeSumCount(df: DataFrame, partCols: Seq[String],
                            unitCol: String, band: Long, bucketWidth: Long,
                            sumName: String, cntName: String): DataFrame = {
    require(bucketWidth > 0 && bucketWidth <= band,
      "bucketWidth must be in [1, band] so the frame's lower edge falls below the row's own bucket")
    val part = partCols.map(col)
    val v = col(unitCol)
    def bucketOf(c: Column): Column = floor(c.cast("double") / bucketWidth).cast("long")
    val withB = df.withColumn("__b", bucketOf(v))

    // (1) in-bucket prefix — RANGE semantics so ties share one frame
    val pw = Window.partitionBy((part :+ col("__b")): _*).orderBy(v)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val prefixed = withB
      .withColumn("__psum", sum(v).over(pw))
      .withColumn("__pcnt", count(lit(1)).over(pw))
      .withColumn("__t", v - band)
      .withColumn("__lob", bucketOf(col("__t")))

    // (2) cumulative bucket totals over OCCUPIED buckets only — one row
    // per key×occupied bucket, so the per-key window runs on a tiny table
    val totals = withB.groupBy((part :+ col("__b")): _*)
      .agg(sum(v).as("__tsum"), count(lit(1)).as("__tcnt"))
    val cw = Window.partitionBy(part: _*).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = totals
      .withColumn("__csum", sum("__tsum").over(cw))
      .withColumn("__ccnt", sum("__tcnt").over(cw))
      .select((part :+ col("__b") :+ col("__csum") :+ col("__ccnt")): _*)
    // The stitch references ids b−1 and lob, which may name EMPTY buckets.
    // Resolve them once, off the fact path: per (key, occupied bucket)
    // there are ≤3 distinct referenced ids (b−1, plus the ≤2 lob values a
    // width-W value interval can produce), so this distinct collapses
    // map-side to bucket cardinality, and the backward as-of runs over
    // two tiny tables — never the fact.
    val refs = withB.select((part :+ (col("__b") - 1).as("__rb")): _*)
      .union(withB.select((part :+ bucketOf(v - band).as("__rb")): _*))
      .distinct()
    val resolved = AsofJoin.backward(refs, cum, partCols, "__rb", "__b")
    val cumHi = resolved.select((part :+ col("__rb").as("__hb")
      :+ col("asof___csum").as("__hsum") :+ col("asof___ccnt").as("__hcnt")): _*)
    val cumLo = resolved.select((part :+ col("__rb").as("__lb")
      :+ col("asof___csum").as("__lsum") :+ col("asof___ccnt").as("__lcnt")): _*)

    // (3) per-bucket suffix table: distinct values only (ties share one
    // suffix under RANGE semantics), keyed by the bucket it serves
    val sw = Window.partitionBy((part :+ col("__b")): _*).orderBy(v)
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val suffix = withB
      .withColumn("__ssum", sum(v).over(sw))
      .withColumn("__scnt", count(lit(1)).over(sw))
      .select((part :+ col("__b").as("__lob") :+ v.as("__w")
        :+ col("__ssum") :+ col("__scnt")): _*)
      .distinct()

    // forward as-of: smallest in-bucket value ≥ v−band carries that
    // bucket's suffix sum/count; no such row (or an absent bucket) → 0
    val stitched = AsofJoin.forward(prefixed, suffix,
        partCols :+ "__lob", "__t", "__w")
      .withColumn("__hb", col("__b") - 1)
      .withColumn("__lb", col("__lob"))
      .join(broadcast(cumHi), partCols :+ "__hb", "left")
      .join(broadcast(cumLo), partCols :+ "__lb", "left")
      .withColumn(sumName,
        col("__psum") + coalesce(col("__hsum"), lit(0L)) -
          coalesce(col("__lsum"), lit(0L)) + coalesce(col("asof___ssum"), lit(0L)))
      .withColumn(cntName,
        col("__pcnt") + coalesce(col("__hcnt"), lit(0L)) -
          coalesce(col("__lcnt"), lit(0L)) + coalesce(col("asof___scnt"), lit(0L)))
    stitched.select((df.columns.map(col) :+ col(sumName) :+ col(cntName)): _*)
  }
}
