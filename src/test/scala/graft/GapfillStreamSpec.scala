package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{GapfillRow, GapfillStream, StreamEvent}

/** Streaming gapfill grid: exactly the batch evt_gapfill semantics —
  * per-type hourly counts with zeros for interior gap hours only, no
  * leading or trailing zeros — across out-of-order arrivals, same-hour
  * duplicates, and randomized batch splits.
  */
class GapfillStreamSpec extends SparkSpec {

  private def at(day: Int, hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${1 + day}%02d $hour%02d:$min%02d:00")

  private val farFuture =
    StreamEvent(99999, Timestamp.valueOf("2024-03-01 00:00:00"), 999999, "advance", 0.0)

  /** The batch grid, independently: per type, hourly counts plus a zero
    * row for every absent hour strictly between present hours.
    */
  private def bruteGrid(events: Seq[StreamEvent]): Set[(String, Long, Long)] =
    events.groupBy(_.event_type).flatMap { case (t, es) =>
      val counts = es.groupBy(e => math.floorDiv(e.ts.getTime, 3600000L))
        .view.mapValues(_.size.toLong).toMap
      (counts.keys.min to counts.keys.max).map(h =>
        (t, h * 3600L, counts.getOrElse(h, 0L)))
    }.toSet

  private def runStream(batches: Seq[Seq[StreamEvent]], name: String): Seq[GapfillRow] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = GapfillStream.grid(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    spark.table(name).as[GapfillRow].collect().toSeq
      .filterNot(_.event_type == farFuture.event_type)
  }

  test("interior gaps emit zeros; no leading or trailing zeros; counts are final") {
    val events = Seq(
      StreamEvent(1, at(0, 9), 1, "view", 1.0),
      StreamEvent(2, at(0, 9, 40), 2, "view", 1.0), // same hour → n=2
      StreamEvent(3, at(0, 13), 3, "view", 1.0),    // hours 10-12 are gaps
      StreamEvent(4, at(0, 11), 4, "click", 1.0))   // single hour, no zeros
    val got = runStream(Seq(events), "gap_basic")
    assert(got.map(r => (r.event_type, r.h_s, r.n)).toSet == bruteGrid(events))
    assert(got.size == got.map(r => (r.event_type, r.h_s)).distinct.size,
      "exactly one grid row per (type, hour)")
  }

  test("pre-epoch rows are late-dropped by Spark's initial watermark (documented bound)") {
    // Spark initializes the watermark at epoch 0, so ts < 1970 is "late"
    // in the very first batch and never reaches the stateful operator —
    // the reason GapfillState's no-hour-yet sentinel (Long.MinValue, not
    // -1) can't collide in practice, pinned here so a framework change
    // that starts delivering such rows fails loudly instead of silently
    // colliding with a real hour id.
    val events = Seq(
      StreamEvent(1, Timestamp.valueOf("1969-12-31 18:30:00"), 1, "view", 1.0),
      StreamEvent(2, Timestamp.valueOf("1969-12-31 22:30:00"), 2, "view", 1.0))
    val got = runStream(Seq(events), "gap_preepoch")
    assert(got.isEmpty, s"pre-epoch rows should be framework-dropped: $got")
  }

  test("out-of-order hours inside the watermark land in the right bins") {
    val events = Seq(
      StreamEvent(1, at(0, 12), 1, "view", 1.0),
      StreamEvent(2, at(0, 10), 2, "view", 1.0), // arrives after hour 12
      StreamEvent(3, at(0, 10, 30), 3, "view", 1.0))
    val got = runStream(Seq(events), "gap_ooo")
    assert(got.map(r => (r.event_type, r.h_s, r.n)).toSet == bruteGrid(events))
  }

  test("a zero-run emits retroactively when the next present hour seals") {
    // batch 1 seals hour 9 (via the batch-2 far-ahead event); the gap
    // zeros for 10-13 may only appear once hour 14 itself seals
    val b1 = Seq(StreamEvent(1, at(0, 9), 1, "view", 1.0))
    val b2 = Seq(StreamEvent(2, at(0, 14), 2, "view", 1.0))
    val got = runStream(Seq(b1, b2), "gap_retro")
    assert(got.map(r => (r.event_type, r.h_s, r.n)).toSet == bruteGrid(b1 ++ b2))
  }

  test("randomized batch splits converge to the batch grid") {
    val rnd = new scala.util.Random(42)
    val events = (0 until 120).map { i =>
      StreamEvent(i.toLong, at(i / 48, (rnd.nextInt(18) + 1), rnd.nextInt(60)),
        rnd.nextInt(20).toLong, if (rnd.nextBoolean()) "view" else "click",
        rnd.nextDouble())
    }
    for (trial <- 0 until 3) {
      // time-sorted-ish arrival with bounded disorder, split at random
      val jittered = events.sortBy(e => e.ts.getTime + rnd.nextInt(300000))
      val cuts = (Seq(0, jittered.size) ++ Seq.fill(3)(rnd.nextInt(jittered.size)))
        .distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => jittered.slice(a, b) }
      val got = runStream(batches, s"gap_rand$trial")
      assert(got.map(r => (r.event_type, r.h_s, r.n)).toSet == bruteGrid(events),
        s"trial $trial diverged")
    }
  }
}
