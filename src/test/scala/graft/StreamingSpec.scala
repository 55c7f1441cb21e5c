package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, StreamEvent}

class StreamingSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
                          mode: String = "append"): Unit = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
  }

  test("tumbling window stream finalizes closed windows exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    input.addData(
      StreamEvent(1, ts(5), 1, "click", 1.0),
      StreamEvent(2, ts(20), 1, "click", 2.0),
      StreamEvent(3, ts(59), 2, "view", 3.0))
    // next hour's event pushes the watermark past the 10:00 window
    input.addData(StreamEvent(4, Timestamp.valueOf("2024-01-01 11:30:00"), 1, "click", 4.0))
    runToMemory(EventStreams.tumblingCounts(input.toDF()), "tumbling")
    val out = spark.table("tumbling").collect()
    assert(out.exists(r => r.getLong(2) == 2 && r.getString(1) == "click"),
      s"10:00 click window should close with 2 events: ${out.mkString(";")}")
  }

  test("expectation monitor reports per-window violation counts exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    input.addData(
      StreamEvent(1, ts(5), 1, "click", 10.0),        // clean
      StreamEvent(2, ts(10), 2, "teleport", 20.0),    // bad type
      StreamEvent(3, ts(15), -7, "view", 30.0),       // bad user
      StreamEvent(4, ts(20), 3, "view", 0.0),         // value out of range
      StreamEvent(5, ts(25), 4, "purchase", 900.0))   // value out of range
    input.addData(StreamEvent(9, Timestamp.valueOf("2024-01-01 12:30:00"), 1, "click", 4.0))
    runToMemory(EventStreams.expectationWindows(input.toDF()), "expect_win")
    val out = spark.table("expect_win").collect()
      .filter(_.getTimestamp(0) == Timestamp.valueOf("2024-01-01 10:00:00"))
    assert(out.length == 1, s"10:00 verdict emitted exactly once: ${out.mkString(";")}")
    val r = out.head
    assert(r.getLong(1) == 5 && r.getLong(2) == 2 && r.getLong(3) == 1 &&
      r.getLong(4) == 1, s"violation counts: $r")
  }

  test("ohlc stream: out-of-order arrivals still open/close in event-time order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    // arrival order ≠ event-time order: the 10:20 row arrives FIRST, but
    // open must be the 10:05 value and close the 10:40 value
    input.addData(
      StreamEvent(3, ts(20), 1, "click", 9.0),
      StreamEvent(1, ts(5), 1, "click", 3.0))
    input.addData(
      StreamEvent(4, ts(40), 1, "click", 1.0), // latest ts → close (also low)
      StreamEvent(2, ts(5), 2, "click", 7.0))  // ts tie with id 1 — id orders it after
    // push the watermark past 11:00 to seal the 10:00 bar
    input.addData(StreamEvent(9, Timestamp.valueOf("2024-01-01 11:30:00"), 1, "click", 5.0))
    runToMemory(EventStreams.ohlcBars(input.toDF()), "ohlc")
    val bars = spark.table("ohlc").collect()
    assert(bars.length == 1, s"exactly the sealed 10:00 bar: ${bars.mkString(";")}")
    val b = bars.head
    assert(b.getAs[Double]("open") == 3.0, s"open must be the earliest (ts, id): $b")
    assert(b.getAs[Double]("close") == 1.0, s"close must be the latest ts: $b")
    assert(b.getAs[Double]("high") == 9.0 && b.getAs[Double]("low") == 1.0)
    assert(b.getAs[Long]("n") == 4L)
  }

  test("session_window stream groups within-gap events per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    input.addData(
      StreamEvent(1, ts(0), 7, "click", 1.0),
      StreamEvent(2, ts(10), 7, "click", 1.0),  // same session (10 < 30 gap)
      StreamEvent(3, ts(55), 7, "click", 1.0))  // new session
    input.addData(StreamEvent(4, Timestamp.valueOf("2024-01-01 13:00:00"), 9, "view", 1.0))
    runToMemory(EventStreams.sessions(input.toDF()), "sessions")
    val out = spark.table("sessions").filter(col("user_id") === 7).collect()
    assert(out.length == 2, s"expected 2 closed sessions: ${out.mkString(";")}")
    assert(out.map(_.getLong(3)).sorted.sameElements(Array(1L, 2L)))
  }

  test("dropDuplicatesWithinWatermark removes in-horizon duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    input.addData(
      StreamEvent(1, ts(0), 1, "click", 1.0),
      StreamEvent(1, ts(1), 1, "click", 1.0), // duplicate id
      StreamEvent(2, ts(2), 1, "view", 1.0))
    runToMemory(EventStreams.dedupedWithinWatermark(input.toDF()), "deduped")
    assert(spark.table("deduped").count() == 2)
  }

  test("stream-stream inner join matches purchases to in-band clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[StreamEvent]
    val purchases = MemoryStream[StreamEvent]
    clicks.addData(
      StreamEvent(1, ts(0), 7, "click", 0.0),
      StreamEvent(2, ts(5), 8, "click", 0.0))
    purchases.addData(
      StreamEvent(10, ts(30), 7, "purchase", 99.0), // click 30 min before → match
      StreamEvent(11, ts(31), 9, "purchase", 49.0)) // user 9 never clicked
    runToMemory(
      EventStreams.clickPurchaseJoin(clicks.toDF(), purchases.toDF()), "ssjoin")
    val out = spark.table("ssjoin").collect()
    assert(out.length == 1, s"only user 7's purchase has an in-band click: ${out.mkString(";")}")
    assert(out.head.getAs[Long]("purchase_id") == 10 &&
      out.head.getAs[Long]("click_id") == 1)
  }

  test("stream-stream left-outer join emits unmatched purchase after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[StreamEvent]
    val purchases = MemoryStream[StreamEvent]
    val q = EventStreams.clickPurchaseJoinOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("ssouter").outputMode("append").start()
    clicks.addData(StreamEvent(1, ts(0), 7, "click", 0.0))
    purchases.addData(StreamEvent(10, ts(30), 9, "purchase", 49.0)) // no click ever
    q.processAllAvailable()
    // push both watermarks far past 10:30 + 1h band + 10 min delay so the
    // unmatched purchase's state is provably complete and must emit
    val far = Timestamp.valueOf("2024-01-01 13:00:00")
    clicks.addData(StreamEvent(2, far, 1, "click", 0.0))
    purchases.addData(StreamEvent(11, far, 1, "purchase", 1.0))
    q.processAllAvailable()
    // one more empty-ish batch lets the eviction-driven output surface
    clicks.addData(StreamEvent(3, Timestamp.valueOf("2024-01-01 14:00:00"), 2, "click", 0.0))
    purchases.addData(StreamEvent(12, Timestamp.valueOf("2024-01-01 14:00:00"), 2, "purchase", 1.0))
    q.processAllAvailable()
    q.stop()
    val unmatched = spark.table("ssouter")
      .filter(col("purchase_id") === 10).collect()
    assert(unmatched.length == 1, "unmatched purchase must emit exactly once")
    assert(unmatched.head.isNullAt(unmatched.head.fieldIndex("click_id")),
      "unmatched purchase joins to null click columns")
  }

  test("stateful stream recovers its state from the checkpoint across restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // the memory sink is not fault-tolerant (recovery is refused); the
    // parquet sink is, and is also the production shape
    val out = java.nio.file.Files.createTempDirectory("graft-out").toString
    val input = MemoryStream[StreamEvent]

    def start() = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    input.addData(StreamEvent(1, ts(0), 1, "click", 10.0))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: offsets and per-user state must
    // be restored, so the next batch continues the count at 2, not 1
    val q2 = start()
    input.addData(StreamEvent(2, ts(1), 1, "click", 5.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).orderBy("n_events").collect()
    assert(rows.nonEmpty && rows.last.getLong(1) == 2 && rows.last.getDouble(2) == 15.0,
      s"restarted query must resume from checkpointed state: ${rows.mkString(";")}")
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = EventStreams.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("running").outputMode("append").start()
    input.addData(StreamEvent(1, ts(0), 1, "click", 10.0))
    q.processAllAvailable()
    input.addData(StreamEvent(2, ts(1), 1, "click", 5.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("running").orderBy("n_events").collect()
    assert(rows.last.getLong(1) == 2 && rows.last.getDouble(2) == 15.0,
      s"state must accumulate across batches: ${rows.mkString(";")}")
  }
}
