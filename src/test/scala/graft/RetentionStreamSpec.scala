package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{RetentionHit, RetentionStream, StreamEvent}

/** Streaming retention increments: exactly one hit per (user, active
  * day) with the batch cohort/offset, across same-day duplicates,
  * out-of-order days, and randomized batch splits; counting the hits
  * reproduces the batch evt_retention matrix.
  */
class RetentionStreamSpec extends SparkSpec {

  private def at(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${1 + day}%02d $hour%02d:00:00")

  private val farFuture =
    StreamEvent(99999, Timestamp.valueOf("2024-03-01 00:00:00"), 999999, "advance", 0.0)

  /** The batch semantics, independently: per user, cohort = min day;
    * one (cohort, offset) pair per distinct active day.
    */
  private def bruteHits(events: Seq[StreamEvent]): Set[(Long, Long, Long)] =
    events.groupBy(_.user_id).flatMap { case (u, es) =>
      val days = es.map(e => math.floorDiv(e.ts.getTime, 86400000L)).distinct
      val cohort = days.min
      days.map(d => (u, cohort, d - cohort))
    }.toSet

  private def runStream(batches: Seq[Seq[StreamEvent]], name: String,
                        watermark: String = "10 minutes"): Seq[RetentionHit] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = RetentionStream.hits(input.toDS(), watermark)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    spark.table(name).as[RetentionHit].collect().toSeq
      .filterNot(_.user_id == farFuture.user_id)
  }

  test("one hit per (user, day) with the batch cohort, despite same-day duplicates") {
    val events = Seq(
      StreamEvent(1, at(0, 9), 1, "view", 1.0),
      StreamEvent(2, at(0, 15), 1, "click", 1.0),  // same day — one hit
      StreamEvent(3, at(2, 10), 1, "view", 1.0),   // offset 2
      StreamEvent(4, at(1, 8), 2, "view", 1.0))    // user 2 cohort = day 1
    val got = runStream(Seq(events), "ret_basic")
    assert(got.size == got.map(h => (h.user_id, h.day_offset)).distinct.size,
      "exactly one hit per (user, day)")
    assert(got.map(h => (h.user_id, h.cohort_day, h.day_offset)).toSet == bruteHits(events))
  }

  test("an out-of-order earlier day inside the watermark still sets the cohort") {
    // day-1 event arrives before the day-0 event; both in one batch, so
    // the watermark has not yet sealed day 0 when day 1 arrives
    val events = Seq(
      StreamEvent(1, at(1, 10), 1, "view", 1.0),
      StreamEvent(2, at(0, 23), 1, "view", 1.0))
    val got = runStream(Seq(events), "ret_ooo")
    assert(got.map(h => (h.user_id, h.cohort_day, h.day_offset)).toSet == bruteHits(events))
  }

  test("property: counting hits reproduces the batch retention matrix over random splits") {
    val rnd = new scala.util.Random(11)
    val events = (1 to 150).map { i =>
      StreamEvent(i.toLong, at(rnd.nextInt(6), 1 + rnd.nextInt(22)),
        (rnd.nextInt(12) + 1).toLong, "view", 1.0)
    }
    val expectedMatrix = bruteHits(events)
      .groupBy(h => (h._2, h._3)).view.mapValues(_.size).toMap
    (0 until 3).foreach { split =>
      // keep batches in day order, shuffle within days; the 2-day
      // watermark makes intra-day reordering (≤ 23 h) watermark-safe
      val batches = new scala.util.Random(split).shuffle(events)
        .sortBy(_.ts.getTime / 86400000L)
        .grouped(23 + split * 11).toSeq
      val got = runStream(batches, s"ret_prop_$split", watermark = "2 days")
      assert(got.size == got.map(h => (h.user_id, h.day_offset)).distinct.size)
      val matrix = got.groupBy(h => (h.cohort_day, h.day_offset)).view.mapValues(_.size).toMap
      assert(matrix == expectedMatrix, s"split $split diverged")
    }
  }
}
