package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One finalized funnel stage: this user's first-touch `view`, `click`,
  * or `purchase` timestamp, emitted exactly once when it becomes
  * immutable under the watermark.
  */
case class FunnelStage(user_id: Long, stage: String, ts: Timestamp)

/** Per-user funnel progress. `vBest`/`cBest`/`pBest` are the current
  * stage minimums (same chain as the batch `evt_funnel`: earliest view,
  * earliest click strictly after it, earliest purchase strictly after
  * that); `clicks`/`purchases` buffer the not-yet-eligible arrivals that
  * could still enter the chain if an earlier predecessor shows up.
  */
case class FunnelProgress(vBest: Option[Long], cBest: Option[Long],
                          pBest: Option[Long], vEmitted: Boolean,
                          cEmitted: Boolean, pEmitted: Boolean,
                          clicks: List[Long], purchases: List[Long])

/** Streaming first-touch funnel (the real-time form of `evt_funnel`,
  * SURVEY.md §2.8): per user, the earliest view, then the earliest click
  * after it, then the earliest purchase after that — each stage emitted
  * exactly once, when it is PROVABLY final.
  *
  * Finality argument (why emission at the watermark is exact):
  *  - `vBest` is a plain minimum; once the watermark passes it, any
  *    future view has `ts > wm ≥ vBest` and cannot lower it.
  *  - `cBest > vBest` by construction, so `wm ≥ cBest` implies the view
  *    stage is final; future clicks cannot undercut `cBest`, and the
  *    buffered INeligible clicks (`ts ≤ vBest`) are dead because the
  *    view they were waiting to undercut can no longer move. The same
  *    chain argument finalizes `pBest`.
  *  - Dropping eligible non-minimum arrivals is safe even though a
  *    stage's threshold can still DECREASE before finalizing (a lower
  *    threshold only grows the eligible set, and every dropped value
  *    was ≥ the retained minimum, which stays in the set).
  *
  * State is bounded: the chain is three longs + three flags, and the
  * buffers only retain events with `ts > wm` (the watermark horizon) —
  * an ineligible event at `ts ≤ wm` can never be unlocked, because the
  * predecessor that would unlock it must arrive with an even smaller
  * timestamp, which the watermark already forbids. A user who stalls
  * mid-funnel keeps O(1) state (their chain minimums) so a click
  * arriving much later still resolves — the same retention contract as
  * [[AsofStream]]'s carry rows. Event-time timeouts wake quiet users so
  * stages finalize without further traffic.
  */
object FunnelStream {

  private val empty = FunnelProgress(None, None, None,
    vEmitted = false, cEmitted = false, pEmitted = false, Nil, Nil)

  def firstTouchFunnel(events: Dataset[StreamEvent]): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "view" || e.event_type == "click" ||
        e.event_type == "purchase")
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, FunnelStage](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[StreamEvent], state: GroupState[FunnelProgress]) =>
          val prev = state.getOption.getOrElse(empty)
          val arrivals = rows.toList
          val wm = state.getCurrentWatermarkMs()
          def times(kind: String) =
            arrivals.filter(_.event_type == kind).map(_.ts.getTime)

          // stage chain: each minimum re-derived from (previous best ++
          // buffered ++ new), split by eligibility against the stage above
          val vBest = (prev.vBest.toList ++ times("view")).minOption

          val clickPool = prev.cBest.toList ++ prev.clicks ++ times("click")
          val (cElig, cWait) = clickPool.partition(t => vBest.exists(t > _))
          val cBest = cElig.minOption

          val purchasePool = prev.pBest.toList ++ prev.purchases ++ times("purchase")
          val (pElig, pWait) = purchasePool.partition(t => cBest.exists(t > _))
          val pBest = pElig.minOption

          // emit each stage once, when final under the watermark
          def fin(best: Option[Long]) = best.exists(_ <= wm)
          val emitV = !prev.vEmitted && fin(vBest)
          val emitC = !prev.cEmitted && fin(cBest)
          val emitP = !prev.pEmitted && fin(pBest)
          val out =
            (if (emitV) List(FunnelStage(user, "view", new Timestamp(vBest.get))) else Nil) ++
            (if (emitC) List(FunnelStage(user, "click", new Timestamp(cBest.get))) else Nil) ++
            (if (emitP) List(FunnelStage(user, "purchase", new Timestamp(pBest.get))) else Nil)

          // buffers: dead once the stage above is final; otherwise only
          // the horizon can still be unlocked
          val clicks = if (fin(vBest)) Nil else cWait.filter(_ > wm)
          val purchases = if (fin(cBest)) Nil else pWait.filter(_ > wm)
          val vEmitted = prev.vEmitted || emitV
          val cEmitted = prev.cEmitted || emitC
          val pEmitted = prev.pEmitted || emitP

          if (pEmitted) {
            // funnel complete: the chain is final, but the emitted flags
            // must survive (removing state would let a straggler rebuild
            // the chain and re-emit); an O(1) tombstone per completed
            // user, same retention contract as AsofStream's carries
            state.update(FunnelProgress(vBest, cBest, pBest,
              vEmitted = true, cEmitted = true, pEmitted = true, Nil, Nil))
          } else if (vBest.isEmpty && clicks.isEmpty && purchases.isEmpty)
            state.remove() // nothing emitted yet and nothing reachable
          else {
            state.update(FunnelProgress(vBest, cBest, pBest,
              vEmitted, cEmitted, pEmitted, clicks, purchases))
            // wake when the watermark can finalize an un-emitted stage or
            // prune a buffered event; candidates are all > wm (anything
            // ≤ wm was handled this invocation)
            val wake = (if (!vEmitted) vBest.toList else Nil) ++
              (if (!cEmitted) cBest.toList else Nil) ++
              (if (!pEmitted) pBest.toList else Nil) ++
              clicks ++ purchases
            wake.minOption.foreach(t =>
              state.setTimeoutTimestamp(math.max(t, wm + 1)))
          }
          out.iterator
      }
  }
}
