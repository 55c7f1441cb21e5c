package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.HeavyHittersAgg

/** One observed item on the ingest stream, keyed by its group (e.g.
  * group = event_type, item = user id; or group = lang, item = token).
  * Frequency tracking is order-insensitive, so like DigestStream this
  * needs no watermark/event-time column.
  */
case class GroupedItem(group: String, item: String)

/** Per-group Misra–Gries counters (at most k entries — the fixed-memory
  * bound is the whole point of the operator).
  */
case class HhState(counters: Map[String, Long])

/** A group's current heavy-hitter estimates, one row per tracked item. */
case class HeavyHitter(group: String, item: String, est: Long)

/** Streaming heavy hitters: the Misra–Gries sketch of
  * [[graft.functions.HeavyHittersAgg]] maintained as `GroupState` — the
  * "trending items per group" operator a live pipeline runs where the
  * batch engine runs the aggregator. State per group is AT MOST k
  * counters forever, whatever the stream length: the only streaming
  * operator family whose state bound is a constant, not a function of
  * the data (contrast DedupStream's distinct-texts bound).
  *
  * The state transition REUSES the aggregator's own algebra — batch
  * items fold via `reduce`, then `merge` with the carried counters — so
  * the Misra–Gries guarantee carries verbatim to any micro-batch split:
  * for every item, est ≤ true, and true − est ≤ n/(k+1) where n is the
  * group's total item count; every item with true frequency > n/(k+1)
  * is tracked. The spec asserts the guarantee (not exact counts — like
  * the batch aggregator, exact values legitimately depend on split
  * boundaries) across randomized splits, plus exactness below k
  * distinct items, where Misra–Gries degrades to plain counting.
  */
object HeavyHittersStream {

  /** Update-mode stream: each micro-batch emits the refreshed counter
    * rows for every touched group (a sink upserts on (group, item);
    * items that fell out of the sketch are absent from the refresh —
    * an upsert sink replaces the group's row set, so stale rows need
    * the emitted set difference, documented sink contract).
    */
  def heavyHitters(items: Dataset[GroupedItem], k: Int): Dataset[HeavyHitter] = {
    import items.sparkSession.implicits._
    val agg = new HeavyHittersAgg(k)
    items.groupByKey(_.group)
      .flatMapGroupsWithState[HhState, HeavyHitter](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[GroupedItem], state: GroupState[HhState]) =>
          val batch = rows.foldLeft(agg.zero)((b, r) => agg.reduce(b, r.item))
          val merged = agg.merge(
            state.getOption.map(_.counters).getOrElse(agg.zero), batch)
          state.update(HhState(merged))
          merged.iterator.map { case (item, est) => HeavyHitter(g, item, est) }
      }
  }
}
