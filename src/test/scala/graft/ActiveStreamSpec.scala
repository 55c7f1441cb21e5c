package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{ActiveHit, ActiveStream, StreamEvent}

/** Streaming rolling-active hits: exactly one window row per
  * (user, served day) across overlapping 7-day windows, same-day rows
  * once per (user, active day); counting the rows over observed days
  * reproduces the batch evt_rolling_active (active_1d, active_7d) per
  * day, across same-day duplicates, out-of-order days, and randomized
  * batch splits.
  */
class ActiveStreamSpec extends SparkSpec {

  private def at(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${1 + day}%02d $hour%02d:00:00")

  private val farFuture =
    StreamEvent(99999, Timestamp.valueOf("2024-03-01 00:00:00"), 999999, "advance", 0.0)

  /** The batch semantics, independently: per observed day d, the
    * distinct users active on d (1d) and within [d−6, d] (7d).
    */
  private def bruteCounts(events: Seq[StreamEvent]): Map[Long, (Int, Int)] = {
    val ud = events.map(e =>
      (e.user_id, math.floorDiv(e.ts.getTime, 86400000L))).distinct
    val observed = ud.map(_._2).distinct
    observed.map { d =>
      val oneDay = ud.count(_._2 == d)
      val week = ud.filter(p => p._2 >= d - 6 && p._2 <= d).map(_._1).distinct.size
      d -> (oneDay, week)
    }.toMap
  }

  private def runStream(batches: Seq[Seq[StreamEvent]], name: String,
                        watermark: String = "10 minutes"): Seq[ActiveHit] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = ActiveStream.hits(input.toDS(), watermark)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    spark.table(name).as[ActiveHit].collect().toSeq
      .filterNot(_.user_id == farFuture.user_id)
  }

  private def countsFromHits(hits: Seq[ActiveHit]): Map[Long, (Int, Int)] = {
    val observed = hits.filter(_.same_day).map(_.day).toSet
    observed.map { d =>
      d -> (hits.count(h => h.same_day && h.day == d),
        hits.count(h => !h.same_day && h.day == d))
    }.toMap
  }

  test("overlapping windows emit each (user, served day) exactly once") {
    val events = Seq(
      StreamEvent(1, at(0, 9), 1, "view", 1.0),
      StreamEvent(2, at(0, 15), 1, "click", 1.0), // same day — one same-day hit
      StreamEvent(3, at(2, 10), 1, "view", 1.0),  // window overlaps day 0's
      StreamEvent(4, at(1, 8), 2, "view", 1.0))
    val got = runStream(Seq(events), "act_basic")
    val win = got.filterNot(_.same_day)
    assert(win.size == win.map(h => (h.user_id, h.day)).distinct.size,
      "exactly one window row per (user, day)")
    // user 1 active on days 0 and 2: served days 0..8, nine rows not 14
    assert(win.count(_.user_id == 1) == 9)
    assert(countsFromHits(got) == bruteCounts(events))
  }

  test("an out-of-order earlier day inside the watermark still counts") {
    val events = Seq(
      StreamEvent(1, at(1, 10), 1, "view", 1.0),
      StreamEvent(2, at(0, 23), 1, "view", 1.0))
    val got = runStream(Seq(events), "act_ooo")
    assert(countsFromHits(got) == bruteCounts(events))
  }

  test("property: counting hits reproduces the batch per-day actives over random splits") {
    val rnd = new scala.util.Random(13)
    val events = (1 to 150).map { i =>
      StreamEvent(i.toLong, at(rnd.nextInt(6), 1 + rnd.nextInt(22)),
        (rnd.nextInt(12) + 1).toLong, "view", 1.0)
    }
    val expected = bruteCounts(events)
    (0 until 3).foreach { split =>
      // keep batches in day order, shuffle within days; the 2-day
      // watermark makes intra-day reordering (≤ 23 h) watermark-safe
      val batches = new scala.util.Random(split).shuffle(events)
        .sortBy(_.ts.getTime / 86400000L)
        .grouped(23 + split * 11).toSeq
      val got = runStream(batches, s"act_prop_$split", watermark = "2 days")
      val win = got.filterNot(_.same_day)
      assert(win.size == win.map(h => (h.user_id, h.day)).distinct.size)
      assert(countsFromHits(got) == expected, s"split $split diverged")
    }
  }
}
