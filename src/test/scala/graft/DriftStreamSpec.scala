package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{DriftStream, PsiWindowRow, StreamEvent}

/** Streaming PSI drift monitor: each tumbling window's full-grid report
  * is emitted exactly once, equals a brute replay of the batch key's
  * arithmetic, and is invariant to batch splits and out-of-order
  * arrival inside the watermark horizon.
  */
class DriftStreamSpec extends SparkSpec {

  private val ref = Map(0L -> 50L, 1L -> 30L, 2L -> 20L) // refT = 100
  private val bins = 10L
  private val winSec = 600L

  private def ev(id: Long, second: Int, value: Double): StreamEvent =
    StreamEvent(id, new Timestamp(1700000000000L + second * 1000L), id % 7,
      "t", value)

  private val farFuture = ev(99999, 86400, 1.0)

  /** The semantics, independently: per window, bin counts on the fixed
    * grid; smoothed PSI terms; total = bin-ordered fold.
    */
  private def brute(events: Seq[StreamEvent]): Map[(Long, Long), (Long, Double, Double)] = {
    def cents(v: Double): Long =
      BigDecimal(v * 100).setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    val refT = ref.values.sum
    events.groupBy(e => math.floorDiv(e.ts.getTime, winSec * 1000) * winSec * 1000)
      .flatMap { case (w, es) =>
        val counts = es.groupBy(e => math.max(0L, math.min(bins - 1, cents(e.value) * 10 / 50000)))
          .view.mapValues(_.size.toLong).toMap
        val curT = counts.values.sum
        val terms = (0L until bins).map { b =>
          val n = counts.getOrElse(b, 0L)
          val pc = (n + 1).toDouble / (curT + bins).toDouble
          val pr = (ref.getOrElse(b, 0L) + 1).toDouble / (refT + bins).toDouble
          (b, n, (pc - pr) * math.log(pc / pr))
        }
        val total = terms.foldLeft(0.0)(_ + _._3)
        terms.map { case (b, n, t) => (w, b) -> (n, t, total) }
      }
  }

  private def runStream(batches: Seq[Seq[StreamEvent]],
                        name: String): Map[(Long, Long), (Long, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = DriftStream.psiWindows(input.toDS(), ref, winSec)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    val rows = spark.table(name).as[PsiWindowRow].collect()
    assert(rows.map(r => (r.window_start.getTime, r.bin)).distinct.length == rows.length,
      "exactly-once per (window, bin)")
    rows.map(r => (r.window_start.getTime, r.bin) -> (r.n, r.psi_term, r.psi_total)).toMap
  }

  // three windows with drifting distributions: low bins, then mid, then high
  // each window block also carries a negative or past-grid value: those
  // must CLAMP into the edge bins (0/9) in both stream and brute — not
  // accumulate in phantom bins the emission loop never covers (round-9
  // advice). Inserted IN window order so the restart test's event-time
  // splits never make them watermark-late.
  private val corpus: Seq[StreamEvent] =
    ((0 until 40).map(i => ev(i, i * 10, 10.0 + (i % 3) * 40))              // window 0: bins 0
      :+ ev(300, 15, -42.5)) ++
    ((0 until 40).map(i => ev(100 + i, 600 + i * 10, 150.0 + (i % 4) * 30)) // window 1: bins 2-4
      :+ ev(301, 610, -0.01)) ++
    ((0 until 40).map(i => ev(200 + i, 1200 + i * 10, 400.0 + (i % 5) * 20)) // window 2: bins 8-9
      :+ ev(302, 1210, 99999.0))

  test("sealed windows report the brute per-bin PSI, full grid, exactly once") {
    val got = runStream(Seq(corpus), "drift_all")
    val exp = brute(corpus :+ farFuture)
    // every window the watermark sealed must match brute exactly
    assert(got.nonEmpty)
    got.foreach { case (k, v) =>
      assert(exp(k) == v, s"window/bin $k: $v != ${exp(k)}")
    }
    // all three corpus windows seal after the far-future event
    val sealedWindows = got.keySet.map(_._1)
    val corpusWindows = corpus
      .map(e => math.floorDiv(e.ts.getTime, winSec * 1000) * winSec * 1000).toSet
    assert(corpusWindows.subsetOf(sealedWindows),
      s"all corpus windows must seal, got $sealedWindows")
    got.keySet.groupBy(_._1).foreach { case (w, ks) =>
      assert(ks.size == bins, s"window $w must emit the full $bins-bin grid")
    }
  }

  test("sealed windows evict their state — retained rows = open windows only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val q = DriftStream.psiWindows(input.toDS(), ref, winSec)
      .writeStream.format("memory").queryName("drift_state")
      .outputMode("append").start()
    input.addData(corpus)
    q.processAllAvailable()
    input.addData(farFuture)
    q.processAllAvailable()
    val stateRows = q.recentProgress.flatMap(_.stateOperators)
      .lastOption.map(_.numRowsTotal).getOrElse(-1L)
    q.stop()
    // the three corpus windows sealed and REMOVED their rows; only the
    // far-future sealer's own window remains open
    assert(stateRows == 1L,
      s"sealed windows must evict — retained state rows: $stateRows")
  }

  test("reports are invariant to batch splits and out-of-order arrival inside the horizon") {
    val rnd = new scala.util.Random(17)
    val whole = runStream(Seq(corpus), "drift_whole")
    for (trial <- 1 to 3) {
      // shuffle within a 5-minute jitter (inside the 10-min watermark),
      // then split into random batches
      val jittered = corpus.sortBy(e => e.ts.getTime + rnd.nextInt(300000))
      val batches = {
        val cuts = (Seq(0, jittered.size) ++ Seq.fill(3)(rnd.nextInt(jittered.size))).sorted
        cuts.zip(cuts.tail).map { case (a, b) => jittered.slice(a, b) }
      }
      val got = runStream(batches, s"drift_split$trial")
      assert(got == whole, s"trial $trial: split run diverged")
    }
  }

  test("checkpointed restart seals pending windows without re-emitting sealed ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("drift-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("drift-out").toString
    // the memory sink refuses checkpoint recovery; parquet is the
    // fault-tolerant sink a real monitor writes to
    val input = MemoryStream[StreamEvent]
    def start() = DriftStream.psiWindows(input.toDS(), ref, winSec)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    // run 1: windows 0+1 arrive — window 1's watermark can seal only
    // window 0; stop with window 1 still pending in state
    val q1 = start()
    input.addData(corpus.take(80))
    q1.processAllAvailable()
    q1.stop()
    // run 2 from the same checkpoint: window 2 + the far-future sealer —
    // window 1 seals from RECOVERED state, not from re-fed data
    val q2 = start()
    input.addData(corpus.drop(80) :+ farFuture)
    q2.processAllAvailable()
    q2.stop()

    val all = spark.read.parquet(out).as[PsiWindowRow].collect()
    assert(all.map(r => (r.window_start.getTime, r.bin)).distinct.length == all.length,
      "no (window, bin) emitted twice across the restart")
    val got = all.map(r =>
      (r.window_start.getTime, r.bin) -> (r.n, r.psi_term, r.psi_total)).toMap
    val exp = brute(corpus :+ farFuture)
    val corpusWindows = corpus
      .map(e => math.floorDiv(e.ts.getTime, winSec * 1000) * winSec * 1000).toSet
    assert(corpusWindows.subsetOf(got.keySet.map(_._1)),
      "all corpus windows sealed across the restart")
    got.foreach { case (k, v) => assert(exp(k) == v, s"$k diverged across restart") }
  }
}
