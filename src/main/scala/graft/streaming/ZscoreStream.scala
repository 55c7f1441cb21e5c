package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One flagged outlier: the event plus its z-score against the moments
  * of every same-type event strictly before it in event time, and the
  * number of events those moments summarize.
  */
case class ZscoreFlag(event_type: String, event_id: Long, ts: Timestamp,
                      v_c: Long, z: Double, n_prior: Long)

/** Per-type state: exact integer moments of everything already
  * processed (count and sum as longs; the sum of squares as a BigInt —
  * its per-event terms ~v² would wrap a long around 10⁹ large-valued
  * events per type, silently disabling the detector forever) + the
  * horizon-bounded buffer of events the watermark has not yet sealed.
  */
case class ZscoreState(n: Long, s: Long, q: BigInt,
                       pending: List[(Long, Long, Long)])

/** Streaming online z-score outliers — the real-time twin of the batch
  * `evt_zscore` key (SURVEY.md §2.8), with the streaming-correct
  * semantics: each event is scored against the moments of all PRIOR
  * same-type events (prefix z-score), because a stream cannot see the
  * future that the batch key's global two-pass mean uses. The moments
  * are the same exact integer (count, sum, sum-of-squares) triple the
  * batch key aggregates, so the double math per event replays an
  * identical operand sequence.
  *
  * Event-time correctness: arrivals buffer per type until the watermark
  * passes them (out-of-order and cross-batch interleavings land in the
  * same buffer), then process in (ts, event_id) order — a total order —
  * updating moments AFTER scoring, so each event's z never includes
  * itself. Emission happens exactly once, when the score is provably
  * final: by the watermark contract no earlier event can still arrive,
  * and later events cannot change a prefix. State: the moment triple +
  * an O(horizon) buffer per event_type; an event-time timeout re-fires
  * quiet types so buffered events still seal.
  */
object ZscoreStream {

  /** Mirror of the batch key's `round(value * 100).cast("long")`:
    * Spark's `round` is HALF_UP on a BigDecimal of the double.
    */
  private def cents(v: Double): Long =
    BigDecimal(v * 100).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  def outliers(events: Dataset[StreamEvent], threshold: Double = 2.5,
               watermark: String = "10 minutes"): Dataset[ZscoreFlag] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[ZscoreState, ZscoreFlag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (kind: String, rows: Iterator[StreamEvent], state: GroupState[ZscoreState]) =>
          val prev = state.getOption.getOrElse(ZscoreState(0L, 0L, BigInt(0), Nil))
          val arrivals = rows.map(e => (e.ts.getTime, e.event_id, cents(e.value))).toList
          val wm = state.getCurrentWatermarkMs()
          val (ripe, pending) = (prev.pending ++ arrivals).partition(_._1 <= wm)

          var n = prev.n; var s = prev.s; var q = prev.q
          val out = List.newBuilder[ZscoreFlag]
          ripe.sorted.foreach { case (tsMs, id, v) =>
            // score against the strictly-prior moments, then absorb
            if (n >= 2) {
              val varc = (q.toDouble - s.toDouble * s / n) / (n - 1)
              if (varc > 0) {
                val z = (v - s.toDouble / n) / math.sqrt(varc)
                if (math.abs(z) > threshold)
                  out += ZscoreFlag(kind, id, new Timestamp(tsMs), v, z, n)
              }
            }
            n += 1; s += v; q += BigInt(v) * v
          }

          if (pending.isEmpty && n == 0L) state.remove()
          else {
            state.update(ZscoreState(n, s, q, pending))
            // wake when the watermark passes the oldest buffered event,
            // so a type that goes quiet still seals its buffer; timeouts
            // must sit beyond the current watermark
            pending.map(_._1).minOption.foreach(t =>
              state.setTimeoutTimestamp(math.max(t, wm + 1)))
          }
          out.result().iterator
      }
  }
}
