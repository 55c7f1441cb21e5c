package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One sealed transition in a user's event-time-ordered stream: the
  * pair (from, to) formed by two consecutive events, stamped with the
  * `to` event's time. Counting these rows downstream (groupBy from/to)
  * IS the batch `evt_transition_matrix` numerator.
  */
case class Transition(user_id: Long, from_type: String, to_type: String,
                      ts: Timestamp)

/** Per-user state: the type of the LAST SEALED event (the prefix's tail
  * — one string, the whole carry), plus the horizon-bounded buffer of
  * arrivals the watermark has not yet sealed.
  */
case class TransitionState(lastType: Option[String],
                           pending: List[(Long, Long, String)])

/** Streaming twin of the batch `evt_transition_matrix` key's pair
  * generation (SURVEY.md §2.8): emits each consecutive (from, to)
  * event-type pair of a user's stream exactly once, in event-time
  * order. Unlike DigestStream's commutative counts, ADJACENCY depends
  * on order — so arrivals buffer per user until the watermark seals
  * them (the ZscoreStream discipline), then process in (ts, event_id)
  * order: a late event inside the horizon still lands between its true
  * neighbors; by the watermark contract nothing earlier can arrive
  * after a pair is emitted. Carried state beyond the buffer is ONE
  * event type per user — the minimal suffix a future event can pair
  * with (the FillStream O(1)/key posture). An event-time timeout
  * re-fires quiet users so their buffers still seal.
  */
object TransitionStream {

  def transitions(events: Dataset[StreamEvent],
                  watermark: String = "10 minutes"): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransitionState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[StreamEvent], state: GroupState[TransitionState]) =>
          val prev = state.getOption.getOrElse(TransitionState(None, Nil))
          val arrivals = rows.map(e => (e.ts.getTime, e.event_id, e.event_type)).toList
          val wm = state.getCurrentWatermarkMs()
          val (ripe, pending) = (prev.pending ++ arrivals).partition(_._1 <= wm)

          var last = prev.lastType
          val out = List.newBuilder[Transition]
          ripe.sorted.foreach { case (tsMs, _, tpe) =>
            last.foreach(f =>
              out += Transition(uid, f, tpe, new Timestamp(tsMs)))
            last = Some(tpe)
          }

          if (pending.isEmpty && last.isEmpty) state.remove()
          else {
            state.update(TransitionState(last, pending))
            pending.map(_._1).minOption.foreach(t =>
              state.setTimeoutTimestamp(math.max(t, wm + 1)))
          }
          out.result().iterator
      }
  }
}
