package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{FilledEvent, FillStream, StreamEvent}

/** Streaming forward fill: exactly-once per event, carrying the latest
  * click / first purchase of the event-time prefix (self included),
  * agreeing with a brute-force fill across out-of-order arrivals and
  * arbitrary batch splits — the real-time twin of `win_fill_forward`.
  */
class FillStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val farFuture =
    StreamEvent(99999, Timestamp.valueOf("2024-01-01 23:00:00"), 99, "zzz_advance", 0.0)

  /** The semantics, independently: per user, sort by (ts, event_id) and
    * fold the carry forward, absorbing before emitting.
    */
  private def bruteFill(events: Seq[StreamEvent]): Map[Long, (Option[Double], Option[Double])] =
    events.groupBy(_.user_id).flatMap { case (_, es) =>
      var lastClick: Option[Double] = None
      var firstPurchase: Option[Double] = None
      es.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        if (e.event_type == "click") lastClick = Some(e.value)
        if (e.event_type == "purchase" && firstPurchase.isEmpty) firstPurchase = Some(e.value)
        e.event_id -> (lastClick, firstPurchase)
      }
    }

  private def runStream(events: Seq[Seq[StreamEvent]],
                        name: String): Map[Long, (Option[Double], Option[Double])] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = FillStream.filled(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    events.foreach { batch => input.addData(batch); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).as[FilledEvent].collect()
      .filter(_.user_id != farFuture.user_id)
    // exactly-once: no event may be emitted twice
    assert(rows.map(_.event_id).distinct.length == rows.length)
    rows.map(f => f.event_id -> (f.last_click, f.first_purchase)).toMap
  }

  test("clicks fill forward and the first purchase sticks") {
    val events = Seq(
      StreamEvent(1, ts(1), 1, "view", 9.0),     // nothing to carry yet
      StreamEvent(2, ts(2), 1, "click", 3.0),    // fills itself
      StreamEvent(3, ts(3), 1, "view", 9.0),     // carries click 3.0
      StreamEvent(4, ts(4), 1, "purchase", 40.0),
      StreamEvent(5, ts(5), 1, "click", 7.0),    // newer click replaces
      StreamEvent(6, ts(6), 1, "purchase", 60.0),// first purchase stays 40
      StreamEvent(7, ts(7), 1, "view", 9.0))
    val got = runStream(Seq(events), "fill_basic")
    assert(got == bruteFill(events))
    assert(got(1L) == (None, None))
    assert(got(3L) == (Some(3.0), None))
    assert(got(6L) == (Some(7.0), Some(40.0)))
    assert(got(7L) == (Some(7.0), Some(40.0)))
  }

  test("a late-arriving click retro-fills later events in the horizon") {
    // the :03 click arrives AFTER the :05 view, but the view has not
    // sealed yet, so it still carries the click — exactly the batch fill
    val events = Seq(
      StreamEvent(1, ts(1), 1, "view", 1.0),
      StreamEvent(3, ts(5), 1, "view", 1.0),
      StreamEvent(2, ts(3), 1, "click", 5.0)) // out of order
    val got = runStream(Seq(events), "fill_ooo")
    assert(got == bruteFill(events))
    assert(got(3L) == (Some(5.0), None), s"the :05 view must carry the late click: $got")
  }

  test("property: agrees with the brute fill over random events and batch splits") {
    val rnd = new scala.util.Random(13)
    val kinds = Array("view", "click", "purchase", "error")
    val events = (1 to 150).map { i =>
      StreamEvent(i.toLong, ts(rnd.nextInt(50)), rnd.nextInt(3).toLong + 1,
        kinds(rnd.nextInt(kinds.length)), (rnd.nextInt(900) + 100) / 10.0)
    }
    val expected = bruteFill(events)
    (0 until 3).foreach { split =>
      val shuffled = new scala.util.Random(split).shuffle(events)
      // watermark-safe shuffle: only reorder within a 9-minute window
      // (inside the 10-minute watermark) so nothing gets dropped as late
      val bounded = shuffled.sortBy(e => e.ts.getTime / (9 * 60 * 1000))
      val batches = bounded.grouped(19 + split * 11).toSeq
      val got = runStream(batches, s"fill_prop_$split")
      assert(got == expected, s"split $split diverged")
    }
  }
}
