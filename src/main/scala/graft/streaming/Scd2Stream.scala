package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One CLOSED SCD2 dimension row: the tier held from `valid_from` until
  * the change at `valid_to`. The currently-open interval is not a
  * streaming output — it is not final until the next change — so it
  * lives in state; a downstream reader unions the closed stream with
  * the open rows at query time, exactly how warehouse SCD2 serving
  * separates history from current.
  */
case class Scd2Row(user_id: Long, tier: Long,
                   valid_from: Timestamp, valid_to: Timestamp)

/** Per-user open interval + the horizon buffer of unsealed signups.
  * State is the open (tier, from) pair plus the bounded buffer — O(1)
  * per key once the watermark drains the buffer, which is what makes a
  * dimension over 1e9 users viable in one streaming job.
  */
case class Scd2State(openTier: Option[(Long, Long)],
                     pending: List[(Long, Long, Long)])

/** Streaming type-2 SCD build — the real-time twin of the batch
  * `complex_scd2` key (SURVEY.md §2.12): per user, signup events carry
  * a value tier (exact integer cents DIV 5000); consecutive equal
  * tiers collapse, and each tier change CLOSES the previous interval.
  *
  * Event-time correctness: signups buffer per user until the watermark
  * passes them (an out-of-order signup can change which interval a
  * later signup closes), then process in (ts, event_id) order — the
  * same total order as the batch window. A closed interval is emitted
  * exactly once, when its closing change is sealed: no earlier signup
  * can still arrive to reorder the run. An event-time timeout re-fires
  * quiet users so buffered signups still seal.
  */
object Scd2Stream {

  private def tierOf(value: Double): Long = math.round(value * 100) / 5000L

  def closedIntervals(events: Dataset[StreamEvent],
                      watermark: String = "10 minutes"): Dataset[Scd2Row] = {
    import events.sparkSession.implicits._
    events
      .filter(_.event_type == "signup")
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Row](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[StreamEvent], state: GroupState[Scd2State]) =>
          val prev = state.getOption.getOrElse(Scd2State(None, Nil))
          val arrivals = rows.map(e => (e.ts.getTime, e.event_id, tierOf(e.value))).toList
          val wm = state.getCurrentWatermarkMs()
          val (ripe, pending) = (prev.pending ++ arrivals).partition(_._1 <= wm)

          var open = prev.openTier
          val out = List.newBuilder[Scd2Row]
          ripe.sortBy(e => (e._1, e._2)).foreach { case (tsMs, _, tier) =>
            open match {
              case Some((curTier, curFrom)) if curTier != tier =>
                out += Scd2Row(user, curTier, new Timestamp(curFrom), new Timestamp(tsMs))
                open = Some((tier, tsMs))
              case Some(_) => // same tier: the open interval absorbs it
              case None => open = Some((tier, tsMs))
            }
          }

          if (pending.isEmpty && open.isEmpty) state.remove()
          else {
            state.update(Scd2State(open, pending))
            // wake when the watermark passes the oldest buffered signup,
            // so a user that goes quiet still seals their buffer
            pending.map(_._1).minOption.foreach(t =>
              state.setTimeoutTimestamp(math.max(t, wm + 1)))
          }
          out.result().iterator
      }
  }
}
