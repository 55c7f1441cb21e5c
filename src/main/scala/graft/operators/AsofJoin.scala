package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reusable as-of joins (SURVEY.md §2.3 `join_asof`, §2.10
  * `channel_align`): each left row picks up the latest right row with
  * `right.ts <= left.ts` (backward) or the earliest with
  * `right.ts >= left.ts` (forward) within the same key.
  *
  * Spark has no native as-of join, and the naive formulations do not
  * scale: a range theta-join degenerates to a nested-loop, and a
  * per-left-row subquery is quadratic. This shape is the scalable one —
  * tag both inputs, union them (no shuffle), ONE hash Exchange on the
  * key, a per-partition sort by (ts, tag, tiebreak), and a running
  * `last(payload, ignoreNulls)` carry-forward over the INCREMENTAL
  * (unboundedPreceding, currentRow) frame — O(n log n) per partition,
  * no point lookups, identical on 1000 executors. The forward direction
  * is the same plan over the reversed ordering (never a following-frame
  * aggregate, which Spark re-evaluates per row — O(n²) per partition).
  *
  * Ties at equal ts resolve right-before-left (tag order), i.e.
  * inclusive `>=`/`<=` semantics like DuckDB's ASOF JOIN. NULL join
  * keys never match (SQL equi-join semantics): null-key right rows are
  * dropped before the union, and a null-key left row emits with a null
  * payload. Null ts on either side also never matches.
  */
object AsofJoin {

  /** @param left      rows to enrich (all columns preserved)
    * @param right     rows providing the carried payload
    * @param key       equality keys present in both inputs
    * @param leftTs    left event-time column (orderable; ns longs work)
    * @param rightTs   right event-time column
    * @param tieBreak  extra right-side order columns for determinism when
    *                  several right rows share one (key, ts): backward
    *                  carries the max-tieBreak row, forward the min
    * @return left columns + `asof_<payload>` columns (null when no right
    *         row precedes/follows the left row) + `asof_ts`
    */
  def backward(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String,
               tieBreak: Seq[String] = Nil): DataFrame =
    build(left, right, key, leftTs, rightTs, tieBreak, forwardDir = false)

  /** Forward as-of join: each left row picks up the EARLIEST right row
    * with `right.ts >= left.ts` within the same key (inclusive; ties
    * among right rows at one (key, ts) resolve by minimum tieBreak).
    * Identical plan to [[backward]] over the time-reversed ordering.
    */
  def forward(left: DataFrame, right: DataFrame, key: Seq[String],
              leftTs: String, rightTs: String,
              tieBreak: Seq[String] = Nil): DataFrame =
    build(left, right, key, leftTs, rightTs, tieBreak, forwardDir = true)

  private def build(left: DataFrame, right: DataFrame, key: Seq[String],
                    leftTs: String, rightTs: String, tieBreak: Seq[String],
                    forwardDir: Boolean): DataFrame = {
    val rPayload = right.columns.filterNot(c => key.contains(c) || c == rightTs)
    val lPayload = left.columns.filterNot(c => key.contains(c) || c == leftTs)
    // a right row with null ts can never satisfy a ts comparison (SQL
    // three-valued logic) — null out its payload so the ignoreNulls
    // carry skips it instead of matching it
    val payloadStruct = when(col(rightTs).isNotNull,
      struct(col(rightTs).as("asof_ts") +: rPayload.map(c => col(c).as(s"asof_$c")): _*))
    val payloadType = StructType(
      right.select(payloadStruct).schema.head.dataType.asInstanceOf[StructType].fields)

    // SQL equi-join semantics: a NULL key equals nothing, so a null-key
    // right row can never be carried into any left row — drop it before
    // the union. (A null-key LEFT row then partitions with no right rows
    // and emits a null payload, which is exactly ASOF LEFT JOIN output.)
    val rightNN = key.foldLeft(right)((df, k) => df.filter(col(k).isNotNull))

    // identical schemas for the union: each side carries the other's
    // columns as typed nulls
    // tieBreak columns ride under internal aliases so a name shared with
    // a left payload column cannot produce duplicate columns in the union
    val tbAlias = tieBreak.zipWithIndex.map { case (c, i) => c -> s"__tb$i" }
    val rTagged = rightNN.select(
      key.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__tag"), payloadStruct.as("__r")) ++
        tbAlias.map { case (c, a) => col(c).as(a) } ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      key.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__tag"),
          lit(null).cast(payloadType).as("__r")) ++
        tbAlias.map { case (c, a) => lit(null).cast(right.schema(c).dataType).as(a) } ++
        lPayload.map(col): _*)

    // backward walks time forward (ts asc): the carry is the latest
    // right at or before each left row. forward is the SAME incremental
    // carry over time walked backward (ts desc): the carry is the
    // earliest right at or after. In both, right (tag 0) sorts before
    // left (tag 1) at equal ts — inclusive semantics — and ties among
    // right rows resolve so the LAST absorbed is max tieBreak
    // (backward) / min tieBreak (forward, desc order). Nulls-first on
    // __ts in BOTH directions: a null-ts left row then has an empty
    // meaningful frame (only null-payload rows precede it) → no match.
    val ordering: Seq[Column] =
      if (forwardDir)
        col("__ts").desc_nulls_first +: col("__tag") +:
          tbAlias.map { case (_, a) => col(a).desc_nulls_first }
      else
        col("__ts").asc_nulls_first +: col("__tag") +:
          tbAlias.map { case (_, a) => col(a).asc_nulls_first }
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("__carried",
        when(col("__ts").isNotNull,
          last(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__tag") === 1)
      .select(
        key.map(col) ++ Seq(col("__ts").as(leftTs)) ++ lPayload.map(col) ++
          (payloadType.fieldNames.toSeq.map(f => col(s"__carried.$f").as(f))): _*)
  }

  /** Bound the match gap (pandas merge_asof `tolerance`): null out the
    * carried payload where `|left.ts − asof_ts| > tolerance`. Requires a
    * numeric ts (the same integral-epoch representation the rest of the
    * library uses). The bound check is overflow-free: the window
    * [ts − tol, ts + tol] is clamped to the long range instead of
    * letting the arithmetic wrap (a pair at opposite extremes must be
    * out of tolerance, not accidentally inside a wrapped window).
    *
    * @param asofCols the payload columns to null; defaults to every
    *                 column named `asof_*`, which is exact when the LEFT
    *                 input had no `asof_`-prefixed columns of its own —
    *                 pass the list explicitly otherwise
    */
  def within(joined: DataFrame, leftTs: String, tolerance: Long,
             asofCols: Seq[String]): DataFrame = {
    require(tolerance >= 0, "tolerance must be non-negative")
    val lts = col(leftTs)
    val lower = when(lts >= lit(Long.MinValue + tolerance), lts - tolerance)
      .otherwise(lit(Long.MinValue))
    val upper = when(lts <= lit(Long.MaxValue - tolerance), lts + tolerance)
      .otherwise(lit(Long.MaxValue))
    // the flag is materialized BEFORE the fold: the fold nulls asof_ts
    // itself, so a per-column predicate would flip after that column
    val withFlag = joined.withColumn("__asof_keep",
      col("asof_ts") >= lower && col("asof_ts") <= upper)
    asofCols.foldLeft(withFlag)((df, c) =>
        df.withColumn(c, when(col("__asof_keep"), col(c))))
      .drop("__asof_keep")
  }

  def within(joined: DataFrame, leftTs: String, tolerance: Long): DataFrame =
    within(joined, leftTs, tolerance,
      joined.columns.filter(_.startsWith("asof_")).toSeq)
}
