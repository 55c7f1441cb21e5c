package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{AsofStream, StreamEvent}

/** Streaming as-of: event-time-correct within the watermark, agreeing
  * with the batch operator, across out-of-order and cross-batch
  * interleavings.
  */
class AsofStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def run(input: MemoryStream[StreamEvent], name: String): Unit = {
    val q = AsofStream.clickBeforePurchase(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    q.processAllAvailable()
    q.stop()
  }

  test("each purchase matches the latest prior click once the watermark passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    // out of order WITHIN the batch: the click at :08 arrives after the
    // purchase at :10 but still precedes it in event time
    input.addData(
      StreamEvent(1, ts(2), 1, "click", 1.0),
      StreamEvent(4, ts(10), 1, "purchase", 9.0),
      StreamEvent(2, ts(8), 1, "click", 1.0),
      StreamEvent(5, ts(1), 2, "purchase", 5.0)) // user 2: no prior click
    // watermark advancer (user 99, far future) closes everything above
    input.addData(StreamEvent(9, Timestamp.valueOf("2024-01-01 12:00:00"), 99, "click", 0.0))
    run(input, "asof_stream")
    val got = spark.table("asof_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSet
    assert(got == Set(
      (1L, 4L, Some(2L)),  // latest click at :08 wins over :02
      (2L, 5L, None)),     // unmatched purchase still emits
      s"streaming as-of matches: $got")
  }

  test("carryIdleMs evicts idle carries: a much-later purchase emits unmatched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    // stepwise batches (data added before start lands in ONE batch,
    // where the carry would never sit idle); advancer events on user 99
    // push the watermark between the user-1 arrivals
    val q = AsofStream.clickBeforePurchase(input.toDS(), carryIdleMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("asof_ttl").outputMode("append").start()
    def step(e: StreamEvent): Unit = { input.addData(e); q.processAllAvailable() }
    step(StreamEvent(1, ts(0), 1, "click", 1.0))                                // carry at 10:00
    step(StreamEvent(9, Timestamp.valueOf("2024-01-01 11:10:00"), 99, "click", 0.0)) // wm → 11:00
    step(StreamEvent(10, Timestamp.valueOf("2024-01-01 11:15:00"), 99, "click", 0.0)) // timeout fires: 60 min idle > 30 → carry evicted
    step(StreamEvent(2, Timestamp.valueOf("2024-01-01 11:20:00"), 1, "purchase", 2.0)) // not late (wm 11:05), finds no carry
    step(StreamEvent(11, Timestamp.valueOf("2024-01-01 13:00:00"), 99, "click", 0.0))
    step(StreamEvent(12, Timestamp.valueOf("2024-01-01 13:30:00"), 99, "click", 0.0)) // wm passes 11:20 → emit
    q.stop()
    val got = spark.table("asof_ttl")
      .collect().map(r => (r.getLong(1), Option(r.get(3)))).toSet
    assert(got == Set((2L, None)),
      s"carry should have expired before the purchase arrived: $got")
  }

  test("agrees with the batch operator across batches, ties, and carry pruning") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val events = Seq(
      StreamEvent(1, ts(0), 1, "click", 1.0),
      StreamEvent(2, ts(5), 1, "click", 1.0),
      StreamEvent(3, ts(5), 1, "purchase", 2.0),  // tie: click id 2 at same ts matches
      StreamEvent(4, ts(7), 2, "click", 1.0),
      StreamEvent(5, ts(9), 2, "purchase", 3.0),
      StreamEvent(6, ts(20), 1, "purchase", 4.0), // carry across the pruned horizon
      StreamEvent(7, ts(30), 2, "click", 1.0),
      StreamEvent(8, ts(40), 2, "purchase", 5.0))
    // batch 1: first half; batch 2: rest; batch 3: watermark advancer
    input.addData(events.take(4))
    input.addData(events.drop(4))
    input.addData(StreamEvent(99, Timestamp.valueOf("2024-01-01 13:00:00"), 99, "click", 0.0))
    run(input, "asof_stream_2")
    val got = spark.table("asof_stream_2")
      .collect().map(r => (r.getLong(1), Option(r.get(3)))).toMap

    val batch = graft.operators.AsofJoin.backward(
        events.filter(_.event_type == "purchase").toDF()
          .selectExpr("user_id", "ts", "event_id AS p_id"),
        events.filter(_.event_type == "click").toDF()
          .selectExpr("user_id", "ts", "event_id"),
        Seq("user_id"), "ts", "ts", tieBreak = Seq("event_id"))
      .selectExpr("p_id", "asof_event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got == batch, s"stream $got vs batch $batch")
  }
}
