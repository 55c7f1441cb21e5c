package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One retention increment: user u was active on `cohort_day + day_offset`,
  * where `cohort_day` is u's first active day. Emitted exactly once per
  * (user, active day); `count(*) GROUP BY (cohort_day, day_offset)` over
  * this stream IS the batch `evt_retention` matrix.
  */
case class RetentionHit(user_id: Long, cohort_day: Long, day_offset: Long)

/** Per-user state: the sealed cohort day (−1 until the first day seals)
  * and the set of active days the watermark has not yet sealed.
  */
case class RetentionState(cohortDay: Long, pendingDays: List[Long])

/** Streaming cohort-retention increments — the real-time twin of the
  * batch `evt_retention` key (SURVEY.md §2.12).
  *
  * Event-time correctness rests on one fact: a day D is SEALED once the
  * watermark passes its end (any further event in D would be late and
  * dropped), and days seal oldest-first, so a user's first SEALED day is
  * their first day, period — no earlier event can ever arrive to change
  * the cohort. Each (user, active day) therefore emits exactly once, at
  * seal time, with a final (cohort_day, day_offset). Re-arrivals within
  * a still-open day collapse into the pending set (set semantics, not
  * counts), so duplicates never emit.
  *
  * The aggregation to the retention matrix is deliberately NOT fused
  * here: the increments are an append stream with exactly-once rows, so
  * any downstream count — another streaming agg, a batch rollup over the
  * sink, a monotonic dashboard counter — is a trivial stateless-keyed
  * count. (Probed: Spark's global-watermark correctness check also
  * rejects chaining a stateful aggregation behind this operator —
  * sealed hits sit exactly at the watermark boundary, which a second
  * stateful operator may discard as late — so the increments stream is
  * the architecturally correct hand-off point, not just a convenience.)
  * State per user: one long + the open days within the horizon.
  */
object RetentionStream {

  private val dayMs = 86400000L

  def hits(events: Dataset[StreamEvent],
           watermark: String = "10 minutes"): Dataset[RetentionHit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[StreamEvent], state: GroupState[RetentionState]) =>
          val prev = state.getOption.getOrElse(RetentionState(-1L, Nil))
          // floorDiv, not /: truncation would disagree with the wmDay
          // floor below for pre-epoch timestamps and mis-bin their days
          val days = (prev.pendingDays ++
            rows.map(e => math.floorDiv(e.ts.getTime, dayMs))).distinct
          val wm = state.getCurrentWatermarkMs()
          // day D is sealed iff wm has passed its end: D < floor(wm/day)
          val wmDay = math.floorDiv(wm, dayMs)
          val (sealedDays, pending) = days.partition(_ < wmDay)
          val sealedSorted = sealedDays.sorted
          val cohort =
            if (prev.cohortDay >= 0) prev.cohortDay
            else sealedSorted.headOption.getOrElse(-1L)
          val out = sealedSorted.map(d => RetentionHit(user, cohort, d - cohort))

          if (pending.isEmpty && cohort < 0) state.remove()
          else {
            state.update(RetentionState(cohort, pending))
            // wake when the earliest open day's end passes the watermark
            pending.minOption.foreach(d =>
              state.setTimeoutTimestamp(math.max((d + 1) * dayMs, wm + 1)))
          }
          out.iterator
      }
  }
}
