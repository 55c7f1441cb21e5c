package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reusable backward as-of join (SURVEY.md §2.3 `join_asof`, §2.10
  * `channel_align`): each left row picks up the latest right row with
  * `right.ts <= left.ts` within the same key.
  *
  * Spark has no native as-of join, and the naive formulations do not
  * scale: a range theta-join degenerates to a nested-loop, and a
  * per-left-row subquery is quadratic. This shape is the scalable one —
  * tag both inputs, union them (no shuffle), ONE hash Exchange on the
  * key, a per-partition sort by (ts, tag, tiebreak), and a running
  * `last(payload, ignoreNulls)` carry-forward. O(n log n) per partition,
  * no point lookups, identical on 1000 executors; ties at equal ts
  * resolve right-before-left (tag order), i.e. inclusive `>=` semantics
  * like DuckDB's ASOF JOIN. NULL join keys never match (SQL equi-join
  * semantics): null-key right rows are dropped before the union, and a
  * null-key left row emits with a null payload.
  */
object AsofJoin {

  /** @param left      rows to enrich (all columns preserved)
    * @param right     rows providing the carried payload
    * @param key       equality keys present in both inputs
    * @param leftTs    left event-time column (orderable; ns longs work)
    * @param rightTs   right event-time column
    * @param tieBreak  extra right-side order columns for determinism when
    *                  several right rows share one (key, ts)
    * @return left columns + `asof_<payload>` columns (null when no right
    *         row precedes the left row) + `asof_ts`
    */
  def backward(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String,
               tieBreak: Seq[String] = Nil): DataFrame = {
    val rPayload = right.columns.filterNot(c => key.contains(c) || c == rightTs)
    val lPayload = left.columns.filterNot(c => key.contains(c) || c == leftTs)
    // a right row with null ts can never satisfy right.ts <= left.ts
    // (SQL three-valued comparison) — null out its payload so the
    // ignoreNulls carry skips it instead of matching it
    val payloadStruct = when(col(rightTs).isNotNull,
      struct(col(rightTs).as("asof_ts") +: rPayload.map(c => col(c).as(s"asof_$c")): _*))
    val payloadType = StructType(
      right.select(payloadStruct).schema.head.dataType.asInstanceOf[StructType].fields)

    // identical schemas for the union: each side carries the other's
    // columns as typed nulls
    // tieBreak columns ride under internal aliases so a name shared with
    // a left payload column cannot produce duplicate columns in the union
    val tbAlias = tieBreak.zipWithIndex.map { case (c, i) => c -> s"__tb$i" }
    // SQL equi-join semantics: a NULL key equals nothing, so a null-key
    // right row can never be carried into any left row — drop it before
    // the union. (A null-key LEFT row then partitions with no right rows
    // and emits a null payload, which is exactly ASOF LEFT JOIN output.)
    val rightNN = key.foldLeft(right)((df, k) => df.filter(col(k).isNotNull))
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

    // ties between several RIGHT rows at one (key, ts) resolve by
    // tieBreak; ties among LEFT rows need no order — they don't update
    // the carry, so any interleaving yields the same carried value
    val ordering: Seq[Column] =
      col("__ts") +: col("__tag") +: tbAlias.map { case (_, a) => col(a) }
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        key.map(col) ++ Seq(col("__ts").as(leftTs)) ++ lPayload.map(col) ++
          (payloadType.fieldNames.toSeq.map(f => col(s"__carried.$f").as(f))): _*)
  }

  /** Forward as-of join: each left row picks up the EARLIEST right row
    * with `right.ts >= left.ts` within the same key (inclusive; ties
    * among right rows at one (key, ts) resolve by minimum tieBreak).
    * Same single-Exchange shape as [[backward]], with the carry running
    * from the future side: `first(payload, ignoreNulls)` over
    * (currentRow, unboundedFollowing). NULL keys and null ts never
    * match, as in [[backward]].
    */
  def forward(left: DataFrame, right: DataFrame, key: Seq[String],
              leftTs: String, rightTs: String,
              tieBreak: Seq[String] = Nil): DataFrame = {
    val rPayload = right.columns.filterNot(c => key.contains(c) || c == rightTs)
    val lPayload = left.columns.filterNot(c => key.contains(c) || c == leftTs)
    val payloadStruct = when(col(rightTs).isNotNull,
      struct(col(rightTs).as("asof_ts") +: rPayload.map(c => col(c).as(s"asof_$c")): _*))
    val payloadType = StructType(
      right.select(payloadStruct).schema.head.dataType.asInstanceOf[StructType].fields)

    val rightNN = key.foldLeft(right)((df, k) => df.filter(col(k).isNotNull))
    val tbAlias = tieBreak.zipWithIndex.map { case (c, i) => c -> s"__tb$i" }
    // tag order flipped vs backward: at equal ts the LEFT row must sort
    // before the right row so its following-frame includes the tie
    // (inclusive >= semantics)
    val rTagged = rightNN.select(
      key.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(1).as("__tag"), payloadStruct.as("__r")) ++
        tbAlias.map { case (c, a) => col(c).as(a) } ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      key.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(0).as("__tag"),
          lit(null).cast(payloadType).as("__r")) ++
        tbAlias.map { case (c, a) => lit(null).cast(right.schema(c).dataType).as(a) } ++
        lPayload.map(col): _*)

    val ordering: Seq[Column] =
      col("__ts") +: col("__tag") +: tbAlias.map { case (_, a) => col(a) }
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(ordering: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    // a null left ts sorts nulls-first, so its following-frame would see
    // every right row — guard explicitly: null ts matches nothing
    // (backward gets this for free from the same sort order: the
    // preceding frame of a nulls-first row is empty)
    rTagged.unionByName(lTagged)
      .withColumn("__carried",
        when(col("__ts").isNotNull,
          first(col("__r"), ignoreNulls = true).over(w)))
      .filter(col("__tag") === 0)
      .select(
        key.map(col) ++ Seq(col("__ts").as(leftTs)) ++ lPayload.map(col) ++
          (payloadType.fieldNames.toSeq.map(f => col(s"__carried.$f").as(f))): _*)
  }

  /** Bound the match gap (pandas merge_asof `tolerance`): run [[backward]]
    * or [[forward]], then null out the carried payload where
    * `|left.ts − asof_ts| > tolerance`. Requires a numeric ts (the same
    * integral-epoch representation the rest of the library uses).
    */
  def within(joined: DataFrame, leftTs: String, tolerance: Long): DataFrame = {
    // the flag is materialized BEFORE the fold: the fold nulls asof_ts
    // itself, so a per-column predicate would flip after that column
    val withFlag = joined.withColumn("__asof_keep",
      abs(col(leftTs) - col("asof_ts")) <= tolerance)
    joined.columns.filter(_.startsWith("asof_")).foldLeft(withFlag)((df, c) =>
        df.withColumn(c, when(col("__asof_keep"), col(c))))
      .drop("__asof_keep")
  }
}
