package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{GroupedItem, HeavyHitter, HeavyHittersStream}

/** The streaming Misra–Gries sketch must satisfy the SAME guarantee as
  * the batch aggregator for any micro-batch split of the stream:
  * est ≤ true, true − est ≤ n/(k+1), and every item above the n/(k+1)
  * threshold tracked — plus exact counts when a group has ≤ k distinct
  * items (where the sketch never shrinks). State stays ≤ k counters per
  * group at every emission.
  */
class HeavyHittersStreamSpec extends SparkSpec {

  private val K = 8

  /** Skewed corpus: per group, item `hot_i` appears ~2^(8-i) times so a
    * handful of items dominate — the regime heavy hitters exist for.
    */
  private def corpus(n: Int, groups: Int): Seq[GroupedItem] = {
    val rnd = new scala.util.Random(23)
    (0 until n).map { _ =>
      val g = s"g${rnd.nextInt(groups)}"
      val r = rnd.nextInt(512)
      // geometric-ish: item 0 half the mass, then tails into rare items
      val item =
        if (r < 256) "hot_0" else if (r < 384) "hot_1"
        else if (r < 448) "hot_2" else if (r < 480) "hot_3"
        else s"rare_${rnd.nextInt(200)}"
      GroupedItem(g, item)
    }
  }

  private def run(batches: Seq[Seq[GroupedItem]]): Seq[Seq[HeavyHitter]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val buf = scala.collection.mutable.ArrayBuffer[Seq[HeavyHitter]]()
    val input = MemoryStream[GroupedItem]
    val q = HeavyHittersStream.heavyHitters(input.toDS(), K)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[HeavyHitter], _: Long) =>
        buf.synchronized { buf += b.collect().toSeq }; ()
      }
      .start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    buf.toSeq
  }

  private def splits(events: Seq[GroupedItem], seed: Int): Seq[Seq[GroupedItem]] = {
    val rnd = new scala.util.Random(seed)
    var rest = rnd.shuffle(events)
    val bs = Seq.newBuilder[Seq[GroupedItem]]
    while (rest.nonEmpty) {
      val n = math.min(rnd.nextInt(150) + 50, rest.size)
      bs += rest.take(n); rest = rest.drop(n)
    }
    bs.result()
  }

  test("the Misra-Gries guarantee holds at the final emission for every split") {
    val events = corpus(3000, groups = 3)
    val truth: Map[(String, String), Long] =
      events.groupBy(e => (e.group, e.item)).map { case (k, v) => k -> v.size.toLong }
    val groupN: Map[String, Long] =
      events.groupBy(_.group).map { case (g, v) => g -> v.size.toLong }

    (1 to 3).foreach { trial =>
      val emissions = run(splits(events, seed = trial))
      // final counters per group = the rows of the last emission that
      // touched the group (Update-mode refresh replaces the group's set)
      val finalRows: Seq[HeavyHitter] = groupN.keys.toSeq.flatMap { g =>
        emissions.reverse.find(_.exists(_.group == g))
          .map(_.filter(_.group == g)).getOrElse(Seq.empty)
      }

      finalRows.groupBy(_.group).foreach { case (g, rows) =>
        assert(rows.size <= K, s"trial $trial: group $g tracks ${rows.size} > $K")
        val err = groupN(g) / (K + 1L)
        rows.foreach { h =>
          val t = truth.getOrElse((g, h.item), 0L)
          assert(h.est <= t, s"trial $trial: $g/${h.item} est ${h.est} > true $t")
          assert(t - h.est <= err,
            s"trial $trial: $g/${h.item} err ${t - h.est} > bound $err")
        }
        // completeness: every item above the threshold is tracked
        val tracked = rows.map(_.item).toSet
        truth.collect { case ((`g`, item), t) if t > err => item }.foreach { item =>
          assert(tracked.contains(item),
            s"trial $trial: $g/$item true>$err but untracked")
        }
      }
    }
  }

  test("below k distinct items the stream counts exactly, whatever the split") {
    val events = (0 until 500).map(i => GroupedItem("only", s"item_${i % 5}"))
    val truth = events.groupBy(_.item).map { case (k, v) => k -> v.size.toLong }
    (1 to 2).foreach { trial =>
      val emissions = run(splits(events, seed = 100 + trial))
      val finalRows = emissions.last // single group: last emission has it all
      assert(finalRows.map(h => h.item -> h.est).toMap == truth,
        s"trial $trial: ≤k distinct must be exact")
    }
  }

  test("every intermediate emission stays within the k-counter state bound") {
    val events = corpus(2000, groups = 2)
    run(splits(events, seed = 7)).foreach { emission =>
      emission.groupBy(_.group).foreach { case (g, rows) =>
        assert(rows.size <= K, s"group $g emitted ${rows.size} rows > k=$K")
      }
    }
  }
}
