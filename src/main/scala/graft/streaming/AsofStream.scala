package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted as-of match: the left (purchase) row plus the latest
  * right (click) at or before it, or nulls when none preceded it.
  */
case class AsofMatch(user_id: Long, p_id: Long, p_ts: Timestamp,
                     click_id: Option[Long], click_ts: Option[Timestamp])

/** Per-key buffers: pending lefts await the watermark; rights are the
  * match candidates, pruned to (everything in the horizon) + (the single
  * newest right behind it — the live carry for future lefts).
  */
case class AsofBuffers(lefts: List[(Long, Long)], rights: List[(Long, Long)])

/** Streaming backward as-of join (the real-time form of the reference's
  * channel alignment / `join_asof`, SURVEY.md §2.3/§7.6).
  *
  * Stream-stream as-of is not expressible with Spark's built-in
  * watermarked interval joins: an as-of match is "the LATEST right at or
  * before each left", a per-left argmax over an unbounded past, not a
  * band intersection. This is the flatMapGroupsWithState state machine
  * that computes it event-time-correctly with BOUNDED state:
  *
  *  - arrivals buffer per key (order-independent, so out-of-order and
  *    cross-batch interleavings are fine);
  *  - a left row emits only once the watermark passes its ts — at that
  *    point every right that could precede it has arrived (that is the
  *    watermark contract), so the emission equals the batch operator's
  *    answer (ties: max (ts, id), matching AsofJoin.backward's
  *    inclusive tieBreak);
  *  - state is pruned to the watermark horizon: pending lefts are by
  *    definition inside it, and of the rights behind it only the single
  *    newest survives as the carry — O(horizon) rows per key, not
  *    O(stream). Key CARDINALITY is still unbounded (every key ever
  *    seen holds one carry row forever by default, because a left may
  *    arrive arbitrarily late after its carry): pass `carryIdleMs` to
  *    expire idle carries, trading unbounded retention for "a left
  *    arriving more than the TTL after the last activity on its key
  *    emits unmatched";
  *  - an event-time timeout re-fires the function when the watermark
  *    passes the oldest pending left even if the key receives no more
  *    data, so quiet keys still flush (and idle carries expire).
  */
object AsofStream {

  /** Match each purchase to the latest same-user click at or before it.
    * Input must carry a watermark on `ts` before grouping.
    *
    * @param carryIdleMs evict a key's carry row once the watermark is
    *                    this far past its ts with no pending lefts;
    *                    `Long.MaxValue` (default) keeps carries forever
    */
  def clickBeforePurchase(events: Dataset[StreamEvent],
                          carryIdleMs: Long = Long.MaxValue): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "click" || e.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofBuffers, AsofMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[StreamEvent], state: GroupState[AsofBuffers]) =>
          val prev = state.getOption.getOrElse(AsofBuffers(Nil, Nil))
          val (newLefts, newRights) = rows.toList.partition(_.event_type == "purchase")
          val lefts = prev.lefts ++ newLefts.map(e => (e.ts.getTime, e.event_id))
          val rights = prev.rights ++ newRights.map(e => (e.ts.getTime, e.event_id))
          val wm = state.getCurrentWatermarkMs()

          val (ripe, pending) = lefts.partition(_._1 <= wm)
          val out = ripe.sorted.map { case (lts, lid) =>
            val best = rights.filter(_._1 <= lts).sorted.lastOption
            AsofMatch(user, lid, new Timestamp(lts),
              best.map(_._2), best.map(b => new Timestamp(b._1)))
          }

          // prune rights to the horizon + the one live carry behind it;
          // with a TTL, an idle carry (no pending lefts, watermark more
          // than carryIdleMs past it) is evicted entirely
          val (ahead, behind) = rights.partition(_._1 > wm)
          val carry = behind.sorted.lastOption
            .filterNot(c => pending.isEmpty && wm - c._1 > carryIdleMs)
          val keptRights = ahead ++ carry.toList
          if (pending.isEmpty && keptRights.isEmpty) state.remove()
          else {
            state.update(AsofBuffers(pending, keptRights))
            // wake when the watermark passes the oldest pending left (so
            // quiet keys still emit), past the newest in-horizon right
            // (so an idle key's buffer prunes to the single carry), or
            // past the carry's TTL (so idle keys evict); timeouts must
            // sit beyond the current watermark
            val wake = pending.map(_._1) ++
              (if (ahead.nonEmpty) List(ahead.map(_._1).max) else Nil) ++
              (if (pending.isEmpty && carryIdleMs < Long.MaxValue)
                 carry.toList.flatMap { c =>
                   val t = c._1 + carryIdleMs // overflow → no TTL wake
                   if (t > c._1) List(t) else Nil
                 }
               else Nil)
            wake.minOption.foreach(t =>
              state.setTimeoutTimestamp(math.max(t, wm + 1)))
          }
          out.iterator
      }
  }
}
