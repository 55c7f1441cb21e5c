package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One forward-filled event: the event plus the most recent click value
  * and the first purchase value at-or-before it (inclusive of itself,
  * matching the batch key's UNBOUNDED PRECEDING..CURRENT ROW frame).
  */
case class FilledEvent(user_id: Long, event_id: Long, ts: Timestamp,
                       last_click: Option[Double], first_purchase: Option[Double])

/** Per-user carry state + the horizon-bounded buffer of events the
  * watermark has not yet sealed. The carry is two scalars per user —
  * unlike a window over history, streaming forward fill needs O(1)
  * state per key forever, which is what makes it viable at 100 TB/day.
  */
case class FillState(lastClick: Option[Double], firstPurchase: Option[Double],
                     pending: List[(Long, Long, String, Double)])

/** Streaming forward fill — the real-time twin of the batch
  * `win_fill_forward` key (SURVEY.md §2.5): per user, every event is
  * emitted with the latest click value and the first purchase value of
  * its event-time prefix, itself included.
  *
  * Event-time correctness: arrivals buffer per user until the watermark
  * passes them (an out-of-order click must retro-fill every later event
  * in the same horizon — both sit in the same buffer until sealed), then
  * process in (ts, event_id) order — a total order — updating the carry
  * BEFORE emitting, so a click fills itself like the batch frame does.
  * Emission happens exactly once, when the fill is provably final: no
  * earlier event can still arrive, and later events cannot change a
  * prefix. An event-time timeout re-fires quiet users so buffered
  * events still seal.
  */
object FillStream {

  def filled(events: Dataset[StreamEvent],
             watermark: String = "10 minutes"): Dataset[FilledEvent] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FillState, FilledEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[StreamEvent], state: GroupState[FillState]) =>
          val prev = state.getOption.getOrElse(FillState(None, None, Nil))
          val arrivals = rows.map(e => (e.ts.getTime, e.event_id, e.event_type, e.value)).toList
          val wm = state.getCurrentWatermarkMs()
          val (ripe, pending) = (prev.pending ++ arrivals).partition(_._1 <= wm)

          var lastClick = prev.lastClick
          var firstPurchase = prev.firstPurchase
          val out = List.newBuilder[FilledEvent]
          ripe.sortBy(e => (e._1, e._2)).foreach { case (tsMs, id, kind, v) =>
            // absorb first: the batch frame includes the current row
            if (kind == "click") lastClick = Some(v)
            if (kind == "purchase" && firstPurchase.isEmpty) firstPurchase = Some(v)
            out += FilledEvent(user, id, new Timestamp(tsMs), lastClick, firstPurchase)
          }

          // the carry never expires (that IS forward fill), so state only
          // leaves when the user has no history and nothing buffered
          if (pending.isEmpty && lastClick.isEmpty && firstPurchase.isEmpty)
            state.remove()
          else {
            state.update(FillState(lastClick, firstPurchase, pending))
            // wake when the watermark passes the oldest buffered event,
            // so a user that goes quiet still seals their buffer
            pending.map(_._1).minOption.foreach(t =>
              state.setTimeoutTimestamp(math.max(t, wm + 1)))
          }
          out.result().iterator
      }
  }
}
