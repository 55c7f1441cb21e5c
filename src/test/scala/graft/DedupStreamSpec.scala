package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{BucketMatch, DedupStream, StreamDoc}

/** Streaming dedup-on-ingest: each doc's best event-time-prior match
  * equals a brute in-order replay of the SAME banding — across
  * out-of-order arrivals and randomized batch splits — and candidate
  * emission is sound (every emitted pair really clears the threshold).
  */
class DedupStreamSpec extends SparkSpec {

  private val threshold = 0.5

  private def at(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val farFuture =
    StreamDoc(999999, Timestamp.valueOf("2024-06-01 00:00:00"), "advance sentinel")

  /** Brute expectation with the operator's own pure functions: replay
    * docs in (ts, id) order; each doc's candidates are bucket-cohabiting
    * priors, best = (max jaccard, min id).
    */
  private def bruteBest(docs: Seq[StreamDoc]): Map[Long, (Long, Double)] = {
    val ordered = docs.sortBy(d => (d.ts.getTime, d.doc_id))
    val index = scala.collection.mutable.Map[Long, List[StreamDoc]]()
    val best = scala.collection.mutable.Map[Long, (Long, Double)]()
    ordered.foreach { d =>
      val keys = DedupStream.bandKeys(d.text, 16, 4)
      val cands = keys.flatMap(index.getOrElse(_, Nil)).distinct
      val toks = DedupStream.tokensOf(d.text)
      val scored = cands
        .map(o => (o.doc_id, DedupStream.jaccard(toks, DedupStream.tokensOf(o.text))))
        .filter(_._2 >= threshold)
      if (scored.nonEmpty) {
        val bj = scored.map(_._2).max
        best(d.doc_id) = (scored.filter(_._2 == bj).map(_._1).min, bj)
      }
      keys.foreach(k => index(k) = d :: index.getOrElse(k, Nil))
    }
    best.toMap
  }

  private def runStream(batches: Seq[Seq[StreamDoc]], name: String,
                        watermark: String = "2 hours"): Seq[BucketMatch] = {
    // default watermark covers the corpus's whole ts span, so arbitrary
    // shuffles stay INSIDE the lateness horizon and the stream must
    // reproduce the brute replay exactly; the late-arrival test below
    // shrinks it to surface the documented miss-only deviation
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = DedupStream.matches(input.toDS(), threshold, watermark = watermark)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    spark.table(name).as[BucketMatch].collect().toSeq
      .filterNot(_.doc_id == farFuture.doc_id)
  }

  private def bestOf(ms: Seq[BucketMatch]): Map[Long, (Long, Double)] =
    ms.groupBy(_.doc_id).map { case (id, cs) =>
      val bj = cs.map(_.jaccard).max
      id -> (cs.filter(_.jaccard == bj).map(_.o_id).min, bj)
    }

  private def corpus(n: Int): Seq[StreamDoc] = {
    // template families with word-level edits → real near-dups across
    // the stream, plus unique fillers that must stay unmatched
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val fam = i % 4
      val words =
        if (fam == 3) Seq(s"unique$i", s"filler$i", s"token$i", s"w$i")
        else Seq("alpha", "beta", s"gamma$fam", "delta", "epsilon",
          if (rnd.nextBoolean()) "zeta" else s"eta$i")
      StreamDoc(i.toLong, at(i % 50), words.mkString(" "))
    }
  }

  test("in-order stream: best prior matches the brute replay; emissions are sound") {
    val docs = corpus(60)
    val got = runStream(docs.grouped(20).toSeq, "dedup_inorder")
    val texts = docs.map(d => d.doc_id -> d.text).toMap
    got.foreach { m =>
      val j = DedupStream.jaccard(
        DedupStream.tokensOf(texts(m.doc_id)), DedupStream.tokensOf(texts(m.o_id)))
      assert(j >= threshold && math.abs(j - m.jaccard) < 1e-12,
        s"unsound emission: $m (true jac $j)")
      assert(m.o_id != m.doc_id, "a doc must never match itself")
    }
    assert(bestOf(got) == bruteBest(docs))
    assert(got.nonEmpty, "the template corpus must produce matches")
  }

  test("out-of-order arrivals inside the watermark do not change any prior set") {
    val docs = corpus(60)
    val shuffled = new scala.util.Random(3).shuffle(docs)
    val got = runStream(shuffled.grouped(25).toSeq, "dedup_ooo")
    assert(bestOf(got) == bruteBest(docs),
      "emission must depend on event time, not arrival order")
  }

  test("property: randomized batch splits agree with the brute replay") {
    val docs = corpus(80)
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val shuffled = rnd.shuffle(docs)
      val cuts = Seq.fill(shuffled.size)(rnd.nextInt(3) + 1)
      val batches = {
        var rest = shuffled; val bs = Seq.newBuilder[Seq[StreamDoc]]
        var i = 0
        while (rest.nonEmpty) {
          val n = math.min(cuts(i % cuts.size) * 13, rest.size)
          bs += rest.take(n); rest = rest.drop(n); i += 1
        }
        bs.result()
      }
      assert(bestOf(runStream(batches, s"dedup_prop$trial")) == bruteBest(docs),
        s"trial $trial diverged")
    }
  }

  test("a doc behind the watermark matches only event-time priors — missed, never wrong") {
    // doc 3 (ts 10:01) arrives only after the watermark sealed doc 1
    // (ts 10:02): doc 1's emission happened without it (the one
    // permitted deviation — a MISSED pair), and doc 3 itself must match
    // nothing, because every indexed doc is in its event-time future
    val a = StreamDoc(1, at(2), "alpha beta gamma delta")
    val b = StreamDoc(2, at(40), "alpha beta gamma delta epsilon")
    val filler = StreamDoc(4, Timestamp.valueOf("2024-01-01 11:00:00"),
      "unrelated filler words only")
    val late = StreamDoc(3, at(1), "alpha beta gamma delta")
    val got = runStream(Seq(Seq(a), Seq(b), Seq(filler), Seq(late)),
      "dedup_late", watermark = "1 minute")
    val gotPairs = got.map(m => (m.doc_id, m.o_id)).toSet
    // the full brute replay: doc1's prior is doc3; doc2's priors are 1, 3
    val brutePairs = Set((1L, 3L), (2L, 1L), (2L, 3L))
    assert(gotPairs.subsetOf(brutePairs),
      s"late handling emitted a pair the replay would not: ${gotPairs.diff(brutePairs)}")
    assert(gotPairs.contains((2L, 1L)), "the in-horizon pair must be found")
    assert(got.forall(_.doc_id != 3L),
      "the late doc must not match its event-time future")
  }

  test("exact-collapse bounds state by DISTINCT texts; answers match the uncollapsed brute") {
    // 40 distinct texts × 5 verbatim copies, ids increasing with event
    // time (every real ingest) → the frontier must stay at ONE
    // occurrence per distinct text per bucket: total index rows ==
    // Σ_text |distinct band keys|, NOT ×5 for the copies. The best-match
    // answers must still equal the brute replay over ALL copies.
    val docs = (0 until 200).map { i =>
      val fam = i % 40
      StreamDoc(i.toLong, at(i / 4),
        s"alpha$fam beta$fam gamma$fam delta$fam epsilon$fam")
    }
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-state").toString
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val q = DedupStream.matches(input.toDS(), threshold)
      .writeStream.format("memory").queryName("dedup_state")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    docs.grouped(50).foreach { b => input.addData(b); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_state").as[BucketMatch].collect().toSeq
      .filterNot(_.doc_id == farFuture.doc_id)
    assert(bestOf(got) == bruteBest(docs),
      "collapse must not change any best-match answer")
    // read the live operator state through the state-store source
    val state = spark.read.format("statestore").load(ckpt)
    val entries = state.selectExpr("sum(size(value.groupState.indexed))")
      .collect()(0).getLong(0)
    val occs = state.selectExpr(
      "sum(aggregate(value.groupState.indexed, 0L, (a, e) -> a + size(e.occs)))")
      .collect()(0).getLong(0)
    // the far-future sentinel advances the watermark but never seals
    // itself (nothing follows it), so it sits in pending, not the index
    val expected = docs.map(_.text).distinct
      .map(t => DedupStream.bandKeys(t, 16, 4).size.toLong).sum
    assert(entries == expected,
      s"index entries $entries != distinct-text bound $expected (uncollapsed would be ~5x)")
    assert(occs == expected,
      s"frontier occurrences $occs != $expected — in-order ingest must keep 1 occ/text")
  }

  test("bestMatches reduces the candidate table with the (jac, -id) tie-break") {
    import spark.implicits._
    val cands = Seq(
      BucketMatch(10, 3, 0.8), BucketMatch(10, 1, 0.8), BucketMatch(10, 2, 0.9),
      BucketMatch(11, 5, 0.6), BucketMatch(11, 5, 0.6)).toDF()
    val got = DedupStream.bestMatches(cands).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((10L, 2L, 0.9), (11L, 5L, 0.6)))
  }
}
