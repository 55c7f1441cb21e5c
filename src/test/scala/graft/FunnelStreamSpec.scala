package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{FunnelStream, StreamEvent}

/** Streaming first-touch funnel: each stage emits exactly once with the
  * batch answer's timestamp, across out-of-order arrivals, batch splits,
  * mid-funnel stalls, and post-completion stragglers.
  */
class FunnelStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val farFuture = Timestamp.valueOf("2024-01-01 15:00:00")

  /** The batch chain on a plain event list: earliest view, earliest
    * click strictly after it, earliest purchase strictly after that.
    */
  private def bruteFunnel(events: Seq[StreamEvent]): Map[Long, Map[String, Long]] =
    events.groupBy(_.user_id).map { case (u, es) =>
      def mins(kind: String, after: Option[Long]): Option[Long] = after match {
        case None => None
        case Some(a) =>
          es.filter(e => e.event_type == kind && e.ts.getTime > a)
            .map(_.ts.getTime).minOption
      }
      val v = es.filter(_.event_type == "view").map(_.ts.getTime).minOption
      val c = mins("click", v)
      val p = mins("purchase", c)
      u -> (v.map("view" -> _).toList ++ c.map("click" -> _).toList ++
        p.map("purchase" -> _).toList).toMap
    }

  private def collectStages(name: String): Map[Long, Map[String, Long]] =
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
      .groupBy(_._1).map { case (u, rs) =>
        // exactly-once per stage
        assert(rs.map(_._2).distinct.length == rs.length,
          s"user $u emitted a stage twice: ${rs.toList}")
        u -> rs.map(r => r._2 -> r._3).toMap
      }

  test("stages finalize in order with the batch timestamps, partial funnels included") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val events = Seq(
      // user 1 completes, arrivals out of order within the batch
      StreamEvent(1, ts(10), 1, "click", 0), // eligible only after the view at :05
      StreamEvent(2, ts(5), 1, "view", 0),
      StreamEvent(3, ts(20), 1, "purchase", 0),
      StreamEvent(4, ts(2), 1, "click", 0),  // before the view: never eligible
      // user 2 stalls after click (no purchase)
      StreamEvent(5, ts(1), 2, "view", 0),
      StreamEvent(6, ts(3), 2, "click", 0),
      // user 3 purchases before ever viewing: purchase ineligible forever
      StreamEvent(7, ts(4), 3, "purchase", 0),
      StreamEvent(8, ts(6), 3, "view", 0))
    input.addData(events: _*)
    input.addData(StreamEvent(99, farFuture, 99, "view", 0)) // watermark advancer
    val q = FunnelStream.firstTouchFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_basic").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = collectStages("funnel_basic")
    // the advancer (user 99) never finalizes: the watermark cannot pass
    // the stream's own maximum event time
    val want = bruteFunnel(events).filter(_._2.nonEmpty)
    assert(got == want, s"got $got\nwant $want")
    assert(got(1L) == Map("view" -> ts(5).getTime, "click" -> ts(10).getTime,
      "purchase" -> ts(20).getTime))
    assert(got(2L) == Map("view" -> ts(1).getTime, "click" -> ts(3).getTime))
    assert(got(3L) == Map("view" -> ts(6).getTime))
  }

  test("an earlier view arriving later unlocks a buffered click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = FunnelStream.firstTouchFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_unlock").outputMode("append").start()
    def step(es: StreamEvent*): Unit = { input.addData(es: _*); q.processAllAvailable() }
    // view at :30 first; the click at :08 is ineligible against it
    step(StreamEvent(1, ts(30), 1, "view", 0),
      StreamEvent(2, ts(8), 1, "click", 0))
    // after that batch wm = :30 − 10 min = :20, so the :08 click (kept
    // while wm was still 0) is now prunable — correctly: any view that
    // could unlock it would have to arrive with ts < :08 ≤ wm, which the
    // watermark forbids. The REAL first view arrives at :25 (in-horizon)
    // and must unlock the in-horizon :27 click, not the dead :08 one.
    step(StreamEvent(3, ts(27), 1, "click", 0),
      StreamEvent(4, ts(25), 1, "view", 0)) // earlier view: now first
    step(StreamEvent(9, farFuture, 99, "view", 0))
    q.stop()
    val got = collectStages("funnel_unlock")
    // batch answer: v=:25, c=min click>:25 = :27 (the :30 view is not
    // the first; the :08 click precedes every view)
    assert(got(1L) == Map("view" -> ts(25).getTime, "click" -> ts(27).getTime),
      s"got $got")
  }

  test("a straggler after completion does not re-emit any stage") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = FunnelStream.firstTouchFunnel(input.toDS())
      .writeStream.format("memory").queryName("funnel_straggler").outputMode("append").start()
    def step(es: StreamEvent*): Unit = { input.addData(es: _*); q.processAllAvailable() }
    step(StreamEvent(1, ts(1), 1, "view", 0),
      StreamEvent(2, ts(2), 1, "click", 0),
      StreamEvent(3, ts(3), 1, "purchase", 0))
    step(StreamEvent(9, Timestamp.valueOf("2024-01-01 11:00:00"), 99, "view", 0))
    // user 1 is complete and finalized; more in-horizon events arrive
    step(StreamEvent(4, Timestamp.valueOf("2024-01-01 11:05:00"), 1, "view", 0),
      StreamEvent(5, Timestamp.valueOf("2024-01-01 11:06:00"), 1, "purchase", 0))
    step(StreamEvent(10, farFuture, 99, "view", 0))
    q.stop()
    val got = collectStages("funnel_straggler")
    assert(got(1L) == Map("view" -> ts(1).getTime, "click" -> ts(2).getTime,
      "purchase" -> ts(3).getTime), s"got $got")
  }

  test("property: agrees with the batch chain over random events and batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(42)
    val kinds = Vector("view", "click", "purchase", "error")
    for (round <- 0 until 3) {
      val events = (0 until 120).map { i =>
        StreamEvent(i.toLong, ts(rnd.nextInt(55)), rnd.nextInt(6).toLong,
          kinds(rnd.nextInt(kinds.length)), 0)
      }
      val input = MemoryStream[StreamEvent]
      val name = s"funnel_prop_$round"
      val q = FunnelStream.firstTouchFunnel(input.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      // batches advance in event time (globally sorted chunks — the
      // watermark contract: we test within-horizon disorder, not
      // late-row dropping, whose semantics belong to the engine), but
      // each chunk is shuffled internally for out-of-order arrivals
      events.sortBy(_.ts.getTime).grouped(1 + rnd.nextInt(40)).foreach { chunk =>
        input.addData(rnd.shuffle(chunk): _*); q.processAllAvailable()
      }
      input.addData(StreamEvent(999, farFuture, 99, "view", 0))
      q.processAllAvailable(); q.stop()
      val got = collectStages(name) - 99L
      val want = bruteFunnel(events).filter(_._2.nonEmpty)
      assert(got == want, s"round $round:\ngot  $got\nwant $want")
    }
  }
}
