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
    // head/tail flags from ONE ascending rank + a whole-partition count:
    // a descending row_number would force a second full sort of the fact
    // per branch, and the interior window below would then re-sort
    // ascending — measured 43 s vs the naive form's 12 s at 10M rows
    // before this was flattened to a single sort per branch (the two
    // branches also share one Exchange via ReuseExchange)
    val tagged = df.withColumn("__chunk", chunk.cast("long"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(sub: _*).orderBy(asc: _*)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(sub: _*)))
      .withColumn("__head", col("__rn") <= lookback)
      .withColumn("__tail", col("__rn") > col("__n") - lookback)
      .drop("__rn", "__n")
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
    * AND CURRENT ROW` ordered by an integral unit column). All arithmetic
    * is integral — no float-association drift vs the naive window.
    *
    * The load-bearing observation: a RANGE frame is a function of the
    * row's (key, v) ALONE — tied rows share one frame — so the whole
    * answer is computed on the distinct-(key, v) table and the fact is
    * touched exactly twice, both embarrassingly parallel:
    *   - one map-side-combinable `groupBy(key, v).count()` (the ties
    *     table: |distinct values| rows, not |rows|), and
    *   - one equi-join back on (key, v) to pick up the finished answer
    *     (left to the planner: it broadcasts when the value domain is
    *     small and shuffles on the high-cardinality (key, v) composite
    *     when it isn't — both wide).
    * No window, sort, or as-of ever runs over the fact. This also
    * sidesteps Spark's sliding-frame evaluator, which re-aggregates the
    * frame contents per row — O(frame × rows) when a wide band keeps
    * most preceding rows in frame (measured: the naive form went 15 s →
    * 45 s over 1M → 3M events at band ≈ the value range).
    *
    * On the ties table, the frame [v−band, v] for a value in bucket
    * b = ⌊v/bucketWidth⌋ splits into:
    *   1. in-bucket prefix ≤ v: an incremental unbounded-PRECEDING
    *      window over (key, bucket) — never a bounded sliding frame;
    *   2. whole buckets strictly between lob = ⌊(v−band)/bucketWidth⌋
    *      and b: cum(b−1) − cum(lob) from a cumulative table over
    *      OCCUPIED buckets only. Referenced ids that name empty buckets
    *      resolve through a backward as-of over a tiny distinct-ids
    *      table — empty buckets contribute 0, so cum(largest occupied
    *      id ≤ x) equals a densified cum(x) exactly. (Never densify the
    *      bucket axis with `sequence`: its length scales with
    *      value-range/bucketWidth, not data, so one outlier row could
    *      blow past the 2^31 sequence cap.)
    *   3. the lower-edge bucket's suffix at threshold v−band, derived
    *      ARITHMETICALLY as total − inclusive-prefix + own-ties (never
    *      an unbounded-FOLLOWING window, which Spark re-aggregates per
    *      row), matched by a forward as-of on (key, lob) — again over
    *      ties-sized tables.
    *
    * bucketWidth stays a knob but now only sizes the small-table
    * windows' partitioning ((key, bucket) keys); the fact-side
    * parallelism is input-partition-proportional regardless. Unit
    * column magnitudes must stay below 2^52 so the bucket division is
    * exact in doubles. A null unit value yields null sum/count (no
    * frame). Null KEY columns: the final equi-join matches them as a
    * group (`<=>`), but the as-of resolution drops null-key groups from
    * the cross-bucket terms — callers with nullable keys should filter
    * or fill them first (the shipped oracle keys have non-null keys).
    */
  def trailingRangeSumCount(df: DataFrame, partCols: Seq[String],
                            unitCol: String, band: Long, bucketWidth: Long,
                            sumName: String, cntName: String): DataFrame = {
    require(bucketWidth > 0 && bucketWidth <= band,
      "bucketWidth must be in [1, band] so the frame's lower edge falls below the row's own bucket")
    val part = partCols.map(col)
    def bucketOf(c: Column): Column = floor(c.cast("double") / bucketWidth).cast("long")

    // (0) the ties table: one row per distinct (key, v), with tie count.
    // The ONLY aggregation over the fact — partial-agg collapses it
    // map-side to the distinct-value cardinality.
    val ties = df.filter(col(unitCol).isNotNull)
      .groupBy((part :+ col(unitCol).as("__v")): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__vsum", col("__v") * col("__cnt"))
      .withColumn("__b", bucketOf(col("__v")))

    // (1) in-bucket INCLUSIVE prefix per distinct value (ROWS ≡ RANGE on
    // a distinct-value axis) — incremental frames only
    val pw = Window.partitionBy((part :+ col("__b")): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bw = Window.partitionBy((part :+ col("__b")): _*).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // probed r15: pref has four downstream consumers whose pruned
    // branches are canonically unequal, so the plan re-aggregates the
    // fact per branch (5 parquet scans at sf0.1). An eager
    // localCheckpoint here collapses that to ONE aggregation — but it
    // measured WORSE at sf0.1 (779 → 1142 ms probe wall, +1 job) and a
    // wash at the ScaleBench 1M row (5.29 → 5.43 s): the branch
    // recomputes are parallel and cheap next to the serialized
    // materialize-and-reread. Left unmaterialized; revisit only if a
    // true-cluster profile shows the redundant scans dominating.
    val pref = ties
      .withColumn("__psum", sum("__vsum").over(pw))
      .withColumn("__pcnt", sum("__cnt").over(pw))
      // per-bucket totals = the LAST prefix value (not max: negative
      // values make __psum non-monotonic; unbounded-BOTH frames are
      // evaluated once per partition, not per row)
      .withColumn("__tsum", last("__psum").over(bw))
      .withColumn("__tcnt", last("__pcnt").over(bw))

    // (2) cumulative bucket totals, read AT the referenced ids in ONE
    // window pass (round-9 rework): the occupied-bucket totals and the
    // distinct referenced ids (each row references its frame's two
    // cross-bucket edges, b−1 and lob — emitted by one explode, not a
    // two-branch union that rebuilt the ties subtree per branch)
    // interleave in one ordered stream per key; a running sum puts
    // cum(largest occupied id ≤ x) on each ref row directly — a ref
    // sorts AFTER a real bucket with the same id (__ref 0-before-1),
    // and an id below every occupied bucket reads the empty prefix,
    // exactly 0 (empty buckets contribute 0, so this equals a
    // densified cum(x) without ever materializing the bucket axis).
    // Replaces the previous separate cum window + backward-as-of
    // resolution; still bin-bounded rows, never raw rows.
    val totals = pref.filter(col("__pcnt") === col("__tcnt"))
      .select((part :+ col("__b") :+ lit(0).as("__ref")
        :+ col("__tsum") :+ col("__tcnt")): _*)
    val refs = ties
      .select((part :+ explode(array(col("__b") - 1,
        bucketOf(col("__v") - band))).as("__b")): _*)
      .distinct()
      .select((part :+ col("__b") :+ lit(1).as("__ref")
        :+ lit(0L).as("__tsum") :+ lit(0L).as("__tcnt")): _*)
    val cw = Window.partitionBy(part: _*).orderBy(col("__b"), col("__ref"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val resolved = totals.union(refs)
      .withColumn("__csum", sum("__tsum").over(cw))
      .withColumn("__ccnt", sum("__tcnt").over(cw))
      .filter(col("__ref") === 1)
      .select((part :+ col("__b").as("__rb")
        :+ col("__csum") :+ col("__ccnt")): _*)
    // the hi/lo lookups below broadcast the SAME canonical relation —
    // alias-qualified joins instead of renamed projections, so the two
    // BroadcastExchanges canonicalize equal and the second reuses the
    // first's build (one resolved computation, not two)
    val cumHi = resolved.as("hi")
    val cumLo = resolved.as("lo")

    // (3) suffix of bucket b at distinct value w, arithmetically:
    // everything in the bucket from w up = total − prefix(w) + w's ties
    val suffix = pref.select((part :+ col("__b").as("__lob") :+ col("__v").as("__w")
      :+ (col("__tsum") - col("__psum") + col("__vsum")).as("__ssum")
      :+ (col("__tcnt") - col("__pcnt") + col("__cnt")).as("__scnt")): _*)

    // (4) assemble the answer per distinct value: forward as-of picks the
    // smallest in-bucket value ≥ v−band (absent bucket/value → 0)
    val probe = pref.withColumn("__t", col("__v") - band)
      .withColumn("__lob", bucketOf(col("__t")))
    val answers = AsofJoin.forward(probe, suffix, partCols :+ "__lob", "__t", "__w")
      .withColumn("__hb", col("__b") - 1)
      .withColumn("__lb", col("__lob"))
      .as("a")
      .join(broadcast(cumHi), partCols.map(c => col(s"a.$c") === col(s"hi.$c"))
        .foldLeft(col("a.__hb") === col("hi.__rb"))(_ && _), "left")
      .join(broadcast(cumLo), partCols.map(c => col(s"a.$c") === col(s"lo.$c"))
        .foldLeft(col("a.__lb") === col("lo.__rb"))(_ && _), "left")
      .withColumn(sumName,
        col("a.__psum") + coalesce(col("hi.__csum"), lit(0L)) -
          coalesce(col("lo.__csum"), lit(0L)) + coalesce(col("a.asof___ssum"), lit(0L)))
      .withColumn(cntName,
        col("a.__pcnt") + coalesce(col("hi.__ccnt"), lit(0L)) -
          coalesce(col("lo.__ccnt"), lit(0L)) + coalesce(col("a.asof___scnt"), lit(0L)))
      .select((partCols.map(c => col(s"a.$c").as(s"__k_$c")) :+ col("a.__v")
        :+ col(sumName) :+ col(cntName)): _*)

    // (5) the fact's second and last touch: equi-join on (key, v).
    // Deliberately UNHINTED — when the distinct-value domain is small
    // the planner broadcasts; when values are near-unique the answers
    // table is fact-sized and a broadcast would OOM, but the shuffle is
    // then on the high-cardinality (key, v) composite — wide either way.
    val joinCond = partCols.map(c => df(c) <=> col(s"__k_$c"))
      .foldLeft(df(unitCol) === col("__v"))(_ && _)
    df.join(answers, joinCond, "left")
      .select((df.columns.map(df(_)) :+ col(sumName) :+ col(cntName)): _*)
  }
}
