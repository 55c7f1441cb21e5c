package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One rolling-active contribution: on `day`, user `user_id` counts
  * toward the 7-day active set (`same_day = false`) or was itself active
  * (`same_day = true`). Window rows are emitted at most once per
  * (user, day) — a served-range high-water mark dedups overlapping
  * 7-day windows — so a plain `count(*) GROUP BY day` over the window
  * rows IS the batch `evt_rolling_active.active_7d` (no DISTINCT
  * needed), and the same count over same-day rows is `active_1d`.
  * Days with no same-day row anywhere are unobserved: the batch twin
  * drops them (a window must end on an observed day), so downstream
  * restricts to days that have ≥ 1 same-day hit.
  */
case class ActiveHit(day: Long, user_id: Long, same_day: Boolean)

/** Per-user state: the highest window day already emitted (dedup for
  * overlapping windows; Long.MinValue until the first emission) and the
  * active days the watermark has not yet sealed. Once a user's pending
  * set drains, the state is ONE long kept forever — the same O(1)/key
  * posture as forward fill ([[FillStream]]): the high-water mark is
  * what makes re-emission impossible, so it cannot be forgotten.
  */
case class ActiveState(maxServed: Long, pendingDays: List[Long])

/** Streaming 7-day rolling actives — the real-time twin of the batch
  * `evt_rolling_active` key (SURVEY.md §2.8).
  *
  * Event-time correctness rests on the same seal fact as
  * [[RetentionStream]]: an active day D is final once the watermark
  * passes its end, and days seal oldest-first. A sealed active day D
  * serves window days D..D+6; the user's previously-served range is
  * contiguous up to `maxServed`, so the fresh, not-yet-emitted window
  * days are exactly max(D, maxServed+1)..D+6 — emitted once, provably
  * final (no earlier event can arrive to have served them already).
  * Re-arrivals within a still-open day collapse into the pending set.
  *
  * As with the other streaming twins, the aggregation is deliberately
  * not fused: the hits are an append stream with exactly-once rows and
  * any downstream count (streaming agg, batch rollup, dashboard
  * counter) is stateless-keyed; Spark's global-watermark check also
  * rejects chaining a second stateful aggregate behind seal-boundary
  * rows.
  */
object ActiveStream {

  private val dayMs = 86400000L
  private val window = 7L

  def hits(events: Dataset[StreamEvent],
           watermark: String = "10 minutes"): Dataset[ActiveHit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ActiveState, ActiveHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[StreamEvent], state: GroupState[ActiveState]) =>
          val prev = state.getOption.getOrElse(ActiveState(Long.MinValue, Nil))
          // floorDiv, not /: truncation would disagree with the wmDay
          // floor below for pre-epoch timestamps and mis-bin their days
          val days = (prev.pendingDays ++
            rows.map(e => math.floorDiv(e.ts.getTime, dayMs))).distinct
          val wm = state.getCurrentWatermarkMs()
          val wmDay = math.floorDiv(wm, dayMs)
          val (sealedDays, pending) = days.partition(_ < wmDay)
          var maxServed = prev.maxServed
          val out = Seq.newBuilder[ActiveHit]
          sealedDays.sorted.foreach { d =>
            out += ActiveHit(d, user, same_day = true)
            val from = math.max(d, maxServed + 1)
            val to = d + window - 1
            (from to to).foreach(wd => out += ActiveHit(wd, user, same_day = false))
            maxServed = math.max(maxServed, to)
          }
          if (pending.isEmpty && maxServed == Long.MinValue) state.remove()
          else {
            state.update(ActiveState(maxServed, pending))
            // wake when the earliest open day's end passes the watermark
            pending.minOption.foreach(d =>
              state.setTimeoutTimestamp(math.max((d + 1) * dayMs, wm + 1)))
          }
          out.result().iterator
      }
  }
}
