package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{HeavyHittersStream, HeavyHitterUpdate, TimedGroupedItem}

/** The TTL'd heavy-hitter lifecycle (the DigestStream pattern on the
  * other NoTimeout operator). Contract under test:
  *  - a group idle past the TTL of event time is evicted exactly once,
  *    flushing its final counter rows;
  *  - eviction drops the sketch: a returning group starts a fresh epoch
  *    (its counts restart from zero, first-epoch items gone);
  *  - the archive-merge contract: the evicted flush plus the last
  *    post-eviction live rows reproduce the all-events counts (exact
  *    below k, where Misra–Gries degrades to plain counting).
  */
class HeavyHittersTtlStreamSpec extends SparkSpec {

  private def ts(second: Int): Timestamp =
    new Timestamp(1700000000000L + second * 1000L)

  /** Run over the batches; emissions per micro-batch, in batch order. */
  private def run(batches: Seq[Seq[TimedGroupedItem]],
                  k: Int = 8): Seq[(Long, Seq[HeavyHitterUpdate])] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Seq[HeavyHitterUpdate])]()
    val input = MemoryStream[TimedGroupedItem]
    val q = HeavyHittersStream.heavyHittersWithTtl(input.toDS(), k,
        "10 seconds", "0 seconds")
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[HeavyHitterUpdate], id: Long) =>
        buf.synchronized { buf += ((id, b.collect().toSeq)) }; ()
      }
      .start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    buf.toSeq.sortBy(_._1)
  }

  // group A trends early then goes idle past the TTL (group B's later
  // events advance the watermark); A returns afterwards with new items
  private val seg1 = Seq(
    TimedGroupedItem("A", "x", ts(0)), TimedGroupedItem("A", "x", ts(1)),
    TimedGroupedItem("A", "y", ts(2)), TimedGroupedItem("B", "p", ts(0)))
  private val seg2 = Seq(
    TimedGroupedItem("B", "q", ts(20)), TimedGroupedItem("B", "p", ts(21)))
  private val seg3 = Seq(
    TimedGroupedItem("A", "z", ts(25)), TimedGroupedItem("B", "p", ts(26)))

  test("idle-past-TTL group flushes its final counters, then restarts a fresh epoch") {
    val emissions = run(Seq(seg1, seg2, seg3))
    val all = emissions.flatMap(_._2)
    val evictions = all.filter(_.evicted)
    assert(evictions.map(_.group).distinct == Seq("A"),
      s"exactly group A crosses the 10 s idle gap (wm 2 → 21 s); got $evictions")
    // below k the sketch is exact: the flush is A's true first-epoch counts
    assert(evictions.map(e => (e.item, e.est)).sorted == Seq(("x", 2L), ("y", 1L)),
      s"final flush must carry the exact epoch counts, got $evictions")
    // eviction dropped the sketch: A's emissions AFTER the eviction
    // batch see only seg3 — no first-epoch item survives
    val evictBatch = emissions.find(_._2.exists(_.evicted)).get._1
    val aAfter = emissions.filter(_._1 > evictBatch).flatMap(_._2)
      .filter(u => u.group == "A" && !u.evicted)
    assert(aAfter.map(u => (u.item, u.est)) == Seq(("z", 1L)),
      s"returning group must start a fresh epoch, got $aAfter")
    // group B never idle past TTL: running totals intact (p seen 3×)
    val bLast = all.filter(u => u.group == "B" && u.item == "p").last
    assert(!bLast.evicted && bLast.est == 3L,
      s"B's running count must survive, got $bLast")
  }

  test("archive flush + current-epoch live rows reproduce the all-events counts") {
    val emissions = run(Seq(seg1, seg2, seg3))
    val all = emissions.flatMap(_._2)
    // per group: its eviction flushes + the LAST live row per item from
    // batches after its last eviction (the upsert-sink contract: a flush
    // supersedes the group's earlier live rows)
    val groups = all.map(_.group).distinct
    val merged = groups.flatMap { g =>
      val evictBatches = emissions.filter(_._2.exists(u => u.evicted && u.group == g)).map(_._1)
      val lastEvict = if (evictBatches.isEmpty) -1L else evictBatches.max
      val archive = all.filter(u => u.evicted && u.group == g)
        .groupBy(_.item).map { case (i, us) => (g, i) -> us.map(_.est).sum }
      val live = emissions.filter(_._1 > lastEvict).flatMap(_._2)
        .filter(u => !u.evicted && u.group == g)
        .groupBy(_.item).map { case (i, us) => (g, i) -> us.last.est }
      (archive.keySet ++ live.keySet).map(k2 =>
        k2 -> (archive.getOrElse(k2, 0L) + live.getOrElse(k2, 0L)))
    }.toMap
    val expected = (seg1 ++ seg2 ++ seg3)
      .groupBy(i => (i.group, i.item)).map { case (k2, is) => k2 -> is.size.toLong }
    assert(merged == expected,
      s"archive+live must reproduce all-events counts: $merged vs $expected")
  }
}
