package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StreamEvent, Transition, TransitionStream}

/** The streaming transition pairs must equal the batch lag-pair
  * generation exactly — same multiset of (user, from, to) with the `to`
  * timestamps — whatever the arrival order within the watermark horizon
  * and however the stream splits into micro-batches. Counting the
  * emitted rows reproduces the batch `evt_transition_matrix` numerator.
  */
class TransitionStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val farFuture =
    StreamEvent(99999, Timestamp.valueOf("2024-01-01 23:00:00"), 99, "zzz_advance", 0.0)

  /** The semantics, independently: per user sort by (ts, event_id) and
    * pair consecutive types.
    */
  private def brutePairs(events: Seq[StreamEvent]): Seq[(Long, String, String, Long)] =
    events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.map(e => (e.ts.getTime, e.event_id, e.event_type)).sorted
      sorted.zip(sorted.drop(1)).map { case ((_, _, f), (t2, _, t)) => (u, f, t, t2) }
    }.sorted

  private def runStream(batches: Seq[Seq[StreamEvent]], name: String): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = TransitionStream.transitions(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    spark.table(name).as[Transition].collect()
      .map(t => (t.user_id, t.from_type, t.to_type, t.ts.getTime)).toSeq.sorted
  }

  private def corpus(n: Int): Seq[StreamEvent] = {
    val rnd = new scala.util.Random(41)
    val types = Seq("view", "click", "purchase", "signup", "error")
    (1 to n).map(i =>
      StreamEvent(i.toLong, ts(rnd.nextInt(50)), rnd.nextInt(6).toLong,
        types(rnd.nextInt(types.size)), 0.0))
  }

  test("streamed pairs equal the batch lag pairs across randomized splits") {
    val events = corpus(300)
    val expected = brutePairs(events)
    val rnd = new scala.util.Random(3)
    (1 to 3).foreach { trial =>
      val batches = {
        var rest = rnd.shuffle(events); val bs = Seq.newBuilder[Seq[StreamEvent]]
        while (rest.nonEmpty) {
          val k = math.min(rnd.nextInt(90) + 30, rest.size)
          bs += rest.take(k); rest = rest.drop(k)
        }
        bs.result()
      }
      // shuffled batches put arrivals far out of event-time order; the
      // default 10-minute horizon cannot hold them all, so replay with
      // a horizon covering the corpus span — the late-data contract is
      // the next test's subject
      val got = runWith(batches, s"tr_split_$trial", "2 hours")
      assert(got == expected, s"trial $trial diverged from batch pairs")
    }
  }

  private def runWith(batches: Seq[Seq[StreamEvent]], name: String,
                      watermark: String): Seq[(Long, String, String, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = TransitionStream.transitions(input.toDS(), watermark)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    spark.table(name).as[Transition].collect()
      .map(t => (t.user_id, t.from_type, t.to_type, t.ts.getTime)).toSeq.sorted
  }

  test("an out-of-order arrival inside the horizon lands between its true neighbors") {
    val events = Seq(
      StreamEvent(1, ts(1), 7, "view", 0.0),
      StreamEvent(3, ts(8), 7, "purchase", 0.0),
      StreamEvent(2, ts(5), 7, "click", 0.0)) // arrives last, ts between
    val got = runStream(Seq(events), "tr_ooo")
    assert(got == brutePairs(events),
      s"click must pair view→click→purchase: $got")
    assert(got.map(p => (p._2, p._3)).toSet ==
      Set(("view", "click"), ("click", "purchase")))
  }

  test("each pair emits exactly once across batch boundaries") {
    val events = (1 to 20).map(i =>
      StreamEvent(i.toLong, ts(i), 1, if (i % 2 == 0) "a" else "b", 0.0))
    val got = runStream(events.grouped(3).toSeq, "tr_once")
    assert(got == brutePairs(events))
    assert(got.size == 19, "20 in-order events form exactly 19 pairs")
  }
}
