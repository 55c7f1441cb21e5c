package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One dense-grid row: event_type was seen `n` times in the hour starting
  * at epoch-second `h_s` — with `n = 0` rows filling every interior gap
  * hour, exactly the batch `evt_gapfill` grid (SURVEY.md §2.8).
  */
case class GapfillRow(event_type: String, h_s: Long, n: Long)

/** Per-key state: the last PRESENT hour already emitted
  * (`Long.MinValue` until the key's first hour seals — a sentinel no
  * real hour can collide with, unlike -1, which is a legitimate
  * pre-epoch hour id under the floorDiv binning below) and the
  * still-open (hour → count) pairs.
  */
case class GapfillState(lastPresent: Long, pending: List[(Long, Long)])

/** Streaming dense-hour gapfill — the real-time twin of the batch
  * `evt_gapfill` key, completing the §2.8 set (sessions, funnel,
  * z-score, retention, as-of all have streaming twins).
  *
  * Event-time correctness rests on the same seal argument as
  * [[RetentionStream]]: an hour H is SEALED once the watermark passes
  * its end — any further event in H would be late and dropped — and
  * hours seal oldest-first. The batch grid emits zeros only for
  * INTERIOR gaps (after the key's first present hour, before its last),
  * never leading or trailing zeros, so sealed empty hours are NOT
  * emitted at seal time: they emit retroactively when a later PRESENT
  * hour seals, as the zero-run between the previously emitted present
  * hour and the new one. By seal monotonicity every hour in that run is
  * itself sealed, so each grid row still emits exactly once, with a
  * final count. A key that never reappears emits no trailing zeros —
  * matching the batch grid, which cannot know about hours after the
  * key's last event either.
  *
  * State per key: one long + the open hours within the watermark
  * horizon (counts, not events — same bound as the batch pre-aggregate).
  */
object GapfillStream {

  private val hourMs = 3600000L

  def grid(events: Dataset[StreamEvent],
           watermark: String = "10 minutes"): Dataset[GapfillRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[GapfillState, GapfillRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[StreamEvent], state: GroupState[GapfillState]) =>
          val prev = state.getOption.getOrElse(GapfillState(Long.MinValue, Nil))
          // floorDiv, not /: pre-epoch timestamps must bin to the hour
          // BELOW, agreeing with the sealing floor on the watermark
          val incoming = rows.map(e => math.floorDiv(e.ts.getTime, hourMs))
            .toSeq.groupBy(identity).view.mapValues(_.size.toLong)
          val merged = (prev.pending ++ incoming).groupBy(_._1)
            .view.mapValues(_.map(_._2).sum).toList
          // hour H is sealed iff the watermark passed its end: H < wmHour
          val wmHour = math.floorDiv(state.getCurrentWatermarkMs(), hourMs)
          val (closed, pending) = merged.partition(_._1 < wmHour)
          var last = prev.lastPresent
          val out = closed.sortBy(_._1).flatMap { case (h, n) =>
            val zeros =
              if (last != Long.MinValue) (last + 1 until h).map(GapfillRow(key, _, 0L))
              else Seq.empty
            last = h
            zeros :+ GapfillRow(key, h, n)
          }
          if (pending.isEmpty && last == Long.MinValue) state.remove()
          else {
            state.update(GapfillState(last, pending))
            // wake when the earliest open hour's end passes the watermark
            pending.map(_._1).minOption.foreach(h =>
              state.setTimeoutTimestamp(
                math.max((h + 1) * hourMs, state.getCurrentWatermarkMs() + 1)))
          }
          out.map(r => r.copy(h_s = r.h_s * 3600L)).iterator
      }
  }
}
