package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{Scd2Row, Scd2Stream, StreamEvent}

/** Streaming SCD2: closed validity intervals emit exactly once when
  * the closing change is sealed, agreeing with a brute-force change
  * collapse across out-of-order arrivals and arbitrary batch splits —
  * the real-time twin of `complex_scd2` (closed rows only; the open
  * interval lives in state by design).
  */
class Scd2StreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val farFuture =
    StreamEvent(99999, Timestamp.valueOf("2024-01-01 23:00:00"), 99, "signup", 0.0)

  /** The batch semantics, independently: per user, sort signups by
    * (ts, event_id), collapse equal-tier runs, close each run at the
    * next change. Returns CLOSED intervals only, as a sorted multiset
    * — several changes can share one (user, ts) via distinct event_ids,
    * so identical interval rows are legitimate and must be counted,
    * which also makes the multiset compare an exactly-once check.
    */
  private def bruteScd2(events: Seq[StreamEvent]): Seq[(Long, Long, Long, Long)] =
    events.filter(_.event_type == "signup").groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val runs = es.sortBy(e => (e.ts.getTime, e.event_id))
        .map(e => (math.round(e.value * 100) / 5000L, e.ts.getTime))
        .foldLeft(List.empty[(Long, Long)]) { case (acc, (tier, t)) =>
          acc match {
            case (curTier, _) :: _ if curTier == tier => acc
            case _ => (tier, t) :: acc
          }
        }.reverse
      runs.zip(runs.drop(1)).map { case ((tier, from), (_, to)) => (u, tier, from, to) }
    }.sorted

  private def runStream(events: Seq[Seq[StreamEvent]],
                        name: String): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = Scd2Stream.closedIntervals(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    events.foreach { batch => input.addData(batch); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    spark.table(name).as[Scd2Row].collect()
      .filter(_.user_id != farFuture.user_id)
      .map(r => (r.user_id, r.tier, r.valid_from.getTime, r.valid_to.getTime))
      .toSeq.sorted
  }

  test("tier changes close intervals; equal tiers collapse; open row stays in state") {
    val events = Seq(
      StreamEvent(1, ts(1), 1, "signup", 10.0),  // tier 0 opens
      StreamEvent(2, ts(2), 1, "signup", 20.0),  // tier 0 again: absorbed
      StreamEvent(3, ts(3), 1, "signup", 80.0),  // tier 1: closes [1,3)
      StreamEvent(4, ts(4), 1, "view", 999.0),   // non-signup: ignored
      StreamEvent(5, ts(5), 1, "signup", 160.0)) // tier 3: closes [3,5)
    val got = runStream(Seq(events), "scd2_basic")
    assert(got == bruteScd2(events))
    assert(got == Seq(
      (1L, 0L, ts(1).getTime, ts(3).getTime),
      (1L, 1L, ts(3).getTime, ts(5).getTime)),
      s"open tier-3 interval must NOT emit: $got")
  }

  test("an out-of-order signup inside the horizon reorders the run correctly") {
    // the :03 tier-1 signup arrives after the :05 tier-0 signup; sealed
    // order is 0@1, 1@3, 0@5 → two closed intervals, not one
    val events = Seq(
      StreamEvent(1, ts(1), 1, "signup", 10.0),
      StreamEvent(3, ts(5), 1, "signup", 20.0),
      StreamEvent(2, ts(3), 1, "signup", 80.0)) // late change
    val got = runStream(Seq(events), "scd2_ooo")
    assert(got == bruteScd2(events))
    assert(got == Seq(
      (1L, 0L, ts(1).getTime, ts(3).getTime),
      (1L, 1L, ts(3).getTime, ts(5).getTime)), s"got $got")
  }

  test("property: agrees with the brute collapse over random signups and batch splits") {
    val rnd = new scala.util.Random(29)
    val events = (1 to 200).map { i =>
      StreamEvent(i.toLong, ts(rnd.nextInt(50)), rnd.nextInt(4).toLong + 1,
        if (rnd.nextInt(4) == 0) "view" else "signup",
        (rnd.nextInt(4) * 50 + 10).toDouble) // tiers 0..3
    }
    val expected = bruteScd2(events)
    assert(expected.nonEmpty, "fixture must close some intervals")
    (0 until 3).foreach { split =>
      val shuffled = new scala.util.Random(split).shuffle(events)
      // watermark-safe shuffle: only reorder within a 9-minute window
      // (inside the 10-minute watermark) so nothing gets dropped as late
      val bounded = shuffled.sortBy(e => e.ts.getTime / (9 * 60 * 1000))
      val batches = bounded.grouped(23 + split * 13).toSeq
      val got = runStream(batches, s"scd2_prop_$split")
      assert(got == expected, s"split $split diverged")
    }
  }
}
