package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StreamEvent, ZscoreFlag, ZscoreStream}

/** Streaming online z-score: exactly-once per flagged event, scored
  * against the strictly-prior prefix in event-time order, agreeing with
  * a brute-force prefix computation across out-of-order arrivals and
  * arbitrary batch splits.
  */
class ZscoreStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val farFuture =
    StreamEvent(99999, Timestamp.valueOf("2024-01-01 23:00:00"), 99, "zzz_advance", 0.0)

  /** The semantics, independently: sort by (ts, event_id), score each
    * event against the exact moments of everything before it.
    */
  private def brutePrefix(events: Seq[StreamEvent], threshold: Double = 2.5): Set[(Long, Long)] = {
    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    events.groupBy(_.event_type).flatMap { case (_, es) =>
      var (n, s) = (0L, 0L)
      var q = BigInt(0)
      es.map(e => (e.ts.getTime, e.event_id, cents(e.value))).sorted.flatMap {
        case (_, id, v) =>
          val flag =
            if (n >= 2) {
              val varc = (q.toDouble - s.toDouble * s / n) / (n - 1)
              if (varc > 0 && math.abs((v - s.toDouble / n) / math.sqrt(varc)) > threshold)
                Some(id -> n)
              else None
            } else None
          n += 1; s += v; q += BigInt(v) * v
          flag
      }
    }.toSet
  }

  private def runStream(events: Seq[Seq[StreamEvent]], name: String): Set[(Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = ZscoreStream.outliers(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    events.foreach { batch => input.addData(batch); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).as[ZscoreFlag].collect()
    // exactly-once: no event may be flagged twice
    assert(rows.map(_.event_id).distinct.length == rows.length)
    rows.map(f => f.event_id -> f.n_prior).toSet
  }

  test("flags a spike against the prior prefix, not the global mean") {
    // nine quiet readings then one spike: the prefix z-score flags the
    // spike; a later return-to-normal is unflagged
    val base = (1 to 9).map(i => StreamEvent(i.toLong, ts(i), 1, "click", 10.0 + (i % 3)))
    val spike = StreamEvent(10, ts(10), 1, "click", 300.0)
    val calm = StreamEvent(11, ts(11), 1, "click", 11.0)
    val events = base :+ spike :+ calm
    val got = runStream(Seq(events), "zs_spike")
    assert(got == brutePrefix(events))
    assert(got.map(_._1) == Set(10L), s"only the spike should flag: $got")
  }

  test("out-of-order arrivals within the watermark land in prefix order") {
    // the :05 event arrives AFTER the :08 event but still scores with
    // the :05 prefix — buffered until the watermark seals it
    val events = Seq(
      StreamEvent(1, ts(1), 1, "click", 10.0),
      StreamEvent(2, ts(2), 1, "click", 12.0),
      StreamEvent(3, ts(3), 1, "click", 11.0),
      StreamEvent(5, ts(8), 1, "click", 10.5),
      StreamEvent(4, ts(5), 1, "click", 500.0)) // out of order, flags vs n=3
    val got = runStream(Seq(events), "zs_ooo")
    assert(got == brutePrefix(events))
    assert(got.contains(4L -> 3L), s"the late spike scores against its prefix: $got")
  }

  test("property: agrees with the brute prefix over random events and batch splits") {
    val rnd = new scala.util.Random(7)
    val events = (1 to 120).map { i =>
      val kind = if (rnd.nextBoolean()) "click" else "view"
      val v = if (rnd.nextInt(12) == 0) 200.0 + rnd.nextInt(900) else 10.0 + rnd.nextInt(20)
      StreamEvent(i.toLong, ts(rnd.nextInt(50)), 1, kind, v)
    }
    val expected = brutePrefix(events)
    assert(expected.nonEmpty, "the generator should produce some outliers")
    (0 until 3).foreach { split =>
      val shuffled = new scala.util.Random(split).shuffle(events)
      // watermark-safe shuffle: only reorder within a 9-minute window
      // (inside the 10-minute watermark) so nothing gets dropped as late
      val bounded = shuffled.sortBy(e => e.ts.getTime / (9 * 60 * 1000))
      val batches = bounded.grouped(17 + split * 13).toSeq
      val got = runStream(batches, s"zs_prop_$split")
      assert(got == expected, s"split $split diverged")
    }
  }
}
