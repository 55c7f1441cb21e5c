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

/** A grouped item with an event-time stamp — input of the TTL'd sketch. */
case class TimedGroupedItem(group: String, item: String,
                            ts: java.sql.Timestamp)

/** TTL'd per-group state: the Misra–Gries counters plus the max event
  * time seen for the group (the TTL clock base, monotone in state).
  */
case class HhTtlState(counters: Map[String, Long], maxTsMs: Long)

/** One emission of the TTL'd heavy-hitter stream: live refreshes
  * (`evicted = false`, upsert on (group, item)) or the group's FINAL
  * counter rows flushed at eviction (`evicted = true` — the sink's cue
  * to archive/drop the group).
  */
case class HeavyHitterUpdate(group: String, item: String, est: Long,
                             evicted: Boolean)

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

  /** The sketch stream WITH A STATE LIFECYCLE — the DigestStream
    * `digestsWithTtl` pattern applied to the other NoTimeout operator:
    * although each group's state is already bounded at k counters, the
    * GROUP DOMAIN itself can be unbounded (trending-per-query-string,
    * per-session, per-campaign), and `NoTimeout` keeps k counters per
    * all-time group forever. Here a group idle for `ttl` of EVENT time
    * (watermark past maxTs(group) + ttl) is dropped after flushing its
    * final counter rows `evicted = true`; a returning group restarts a
    * fresh sketch epoch. The Misra–Gries guarantee then holds PER EPOCH
    * (est ≤ true and true − est ≤ n/(k+1) over the events since the
    * group's last eviction) — the right semantics for a trending
    * operator, where an idle-gap reset is a feature: counts from a
    * season ago should not anchor today's trends. Same determinism
    * contract as the digest TTL (event-time clock, batch-quantized
    * eviction timing).
    */
  def heavyHittersWithTtl(items: Dataset[TimedGroupedItem], k: Int,
                          ttl: String, watermarkDelay: String): Dataset[HeavyHitterUpdate] = {
    import items.sparkSession.implicits._
    val agg = new HeavyHittersAgg(k)
    val ttlMs = EventTimeTtl.millis(ttl)
    items.withWatermark("ts", watermarkDelay)
      .groupByKey(_.group)
      .flatMapGroupsWithState[HhTtlState, HeavyHitterUpdate](
        org.apache.spark.sql.streaming.OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout) {
        (g: String, rows: Iterator[TimedGroupedItem], state: GroupState[HhTtlState]) =>
          if (state.hasTimedOut) {
            val fin = state.get.counters
            state.remove()
            fin.iterator.map { case (item, est) =>
              HeavyHitterUpdate(g, item, est, evicted = true)
            }
          } else {
            val st = state.getOption.getOrElse(HhTtlState(agg.zero, Long.MinValue))
            var maxTs = st.maxTsMs
            val batch = rows.foldLeft(agg.zero) { (b, r) =>
              maxTs = math.max(maxTs, r.ts.getTime)
              agg.reduce(b, r.item)
            }
            val merged = agg.merge(st.counters, batch)
            state.update(HhTtlState(merged, maxTs))
            val wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(math.max(maxTs + ttlMs, wm + 1))
            merged.iterator.map { case (item, est) =>
              HeavyHitterUpdate(g, item, est, evicted = false)
            }
          }
      }
  }
}
