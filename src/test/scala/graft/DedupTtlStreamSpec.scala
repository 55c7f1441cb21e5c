package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{BucketMatch, DedupStream, StreamDoc}

/** The TTL'd dedup-on-ingest lifecycle (round-9): emissions equal a
  * brute replay with the SAME event-time eviction rule across
  * randomized splits; an infinite-horizon TTL reproduces the non-TTL
  * stream exactly; reappearing texts restart provenance; idle state
  * drains to zero; and the archive-merge contract holds — every match
  * the TTL loses vs the full stream has a recency gap above the TTL
  * (i.e. is recoverable by a periodic batch pass over the archive),
  * and every in-window match survives with the same jaccard.
  */
class DedupTtlStreamSpec extends SparkSpec {

  private val threshold = 0.5
  private val ttlStr = "300 seconds"
  private val ttlMs = 300000L

  private def at(sec: Int): Timestamp = new Timestamp(1700000000000L + sec * 1000L)

  private val farFuture =
    StreamDoc(999999, new Timestamp(1700000000000L + 365L * 86400000L),
      "advance sentinel")

  /** Independent brute model, replayed per bucket at TEXT granularity
    * (no frontier): each text keeps ALL copies of its CURRENT
    * incarnation; a probing doc first drops texts idle past the TTL at
    * its own event time, then per live text with a prior copy emits
    * (min prior id in-incarnation, jaccard); its own copy then refreshes
    * (or re-creates) the text's entry.
    */
  private def bruteTtl(docs: Seq[StreamDoc],
                       ttl: Long): Set[(Long, Long, Double)] = {
    case class E(var copies: List[(Long, Long)], var lastTs: Long)
    val ordered = docs.sortBy(d => (d.ts.getTime, d.doc_id))
    val index = scala.collection.mutable.Map[(Long, String), E]()
    val out = scala.collection.mutable.Set[(Long, Long, Double)]()
    ordered.foreach { d =>
      val ts = d.ts.getTime
      val toks = DedupStream.tokensOf(d.text)
      if (toks.nonEmpty) {
        DedupStream.bandKeys(d.text, 16, 4).foreach { b =>
          index.filterInPlace { case ((b2, _), e) =>
            b2 != b || e.lastTs + ttl >= ts
          }
          index.foreach { case ((b2, text), e) =>
            if (b2 == b) {
              val prior = e.copies.filter(o =>
                o._1 < ts || (o._1 == ts && o._2 < d.doc_id))
              if (prior.nonEmpty) {
                val j = DedupStream.jaccard(toks, DedupStream.tokensOf(text))
                if (j >= threshold) out += ((d.doc_id, prior.map(_._2).min, j))
              }
            }
          }
          val e = index.getOrElseUpdate((b, d.text), E(Nil, Long.MinValue))
          e.copies ::= (ts, d.doc_id)
          e.lastTs = math.max(e.lastTs, ts)
        }
      }
    }
    out.toSet
  }

  private def runStream(batches: Seq[Seq[StreamDoc]], name: String,
                        ttl: Option[String],
                        watermark: String = "2 hours"): Seq[BucketMatch] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val ds = ttl match {
      case Some(t) => DedupStream.matchesWithTtl(input.toDS(), threshold, t,
        watermark = watermark)
      case None => DedupStream.matches(input.toDS(), threshold,
        watermark = watermark)
    }
    val q = ds.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    spark.table(name).as[BucketMatch].collect().toSeq
      .filterNot(_.doc_id == farFuture.doc_id)
  }

  /** Families recurring at gaps on BOTH sides of the TTL: fam 0/1 tight
    * (within TTL — entries stay alive), fam 2 sparse (gap > TTL — dies
    * and restarts every recurrence), plus unique fillers.
    */
  private def corpus(n: Int): Seq[StreamDoc] = {
    val rnd = new scala.util.Random(11)
    (0 until n).map { i =>
      val fam = i % 4
      // sparse family: 350 s between copies (> TTL — dies each gap);
      // tight: 60 s (stays alive). Spans stay UNDER the 2 h watermark
      // horizon so shuffled arrivals are never late — exactness holds.
      val sec = fam match {
        case 2 => (i / 4) * 350
        case _ => (i / 4) * 60 + fam * 7
      }
      val words =
        if (fam == 3) Seq(s"unique$i", s"filler$i", s"token$i", s"w$i")
        else Seq("alpha", "beta", s"gamma$fam", "delta", "epsilon",
          if (rnd.nextBoolean()) "zeta" else s"eta$i")
      StreamDoc(i.toLong, at(sec), words.mkString(" "))
    }
  }

  test("an infinite-horizon TTL reproduces the non-TTL stream exactly") {
    val docs = corpus(60)
    val full = runStream(docs.grouped(20).toSeq, "dttl_full", None)
    val inf = runStream(docs.grouped(20).toSeq, "dttl_inf", Some("3650 days"))
    assert(inf.toSet == full.toSet,
      "a TTL beyond the corpus horizon must change nothing")
    assert(full.nonEmpty)
  }

  test("emissions equal the brute eviction replay, split-invariantly") {
    val docs = corpus(80)
    val expect = bruteTtl(docs, ttlMs)
    val rnd = new scala.util.Random(5)
    (1 to 3).foreach { trial =>
      val shuffled = rnd.shuffle(docs)
      val batches = {
        var rest = shuffled; val bs = Seq.newBuilder[Seq[StreamDoc]]
        while (rest.nonEmpty) {
          val k = math.min(rnd.nextInt(30) + 5, rest.size)
          bs += rest.take(k); rest = rest.drop(k)
        }
        bs.result()
      }
      val got = runStream(batches, s"dttl_prop$trial", Some(ttlStr))
        .map(m => (m.doc_id, m.o_id, m.jaccard)).toSet
      assert(got == expect, s"trial $trial: diff ${got.diff(expect)} / ${expect.diff(got)}")
    }
  }

  test("a text reappearing after eviction restarts provenance") {
    val a = StreamDoc(1, at(0), "alpha beta gamma delta")
    val b = StreamDoc(2, at(400), "alpha beta gamma delta")  // > TTL after a
    val c = StreamDoc(3, at(500), "alpha beta gamma delta")  // < TTL after b
    val got = runStream(Seq(Seq(a), Seq(b), Seq(c)), "dttl_reborn", Some(ttlStr))
    val pairs = got.map(m => (m.doc_id, m.o_id)).toSet
    assert(pairs == Set((3L, 2L)),
      s"b must match nothing (a evicted) and c must attribute to b, not a: $pairs")
  }

  test("archive-merge contract: losses vs the full stream are exactly the out-of-window pairs") {
    val docs = corpus(80)
    val texts = docs.map(d => d.doc_id -> d.text).toMap
    val byTs = docs.map(d => d.doc_id -> d.ts.getTime).toMap
    val full = runStream(docs.grouped(25).toSeq, "dttl_cl_full", None)
      .map(m => (m.doc_id, texts(m.o_id), m.jaccard)).toSet
    val ttl = runStream(docs.grouped(25).toSeq, "dttl_cl_ttl", Some(ttlStr))
      .map(m => (m.doc_id, texts(m.o_id), m.jaccard)).toSet
    def recent(d: Long, t: String): Boolean = {
      val lastCopy = docs.filter(o => o.text == t &&
        (o.ts.getTime < byTs(d) ||
          (o.ts.getTime == byTs(d) && o.doc_id < d)))
        .map(_.ts.getTime).maxOption
      lastCopy.exists(byTs(d) - _ <= ttlMs)
    }
    assert(ttl.subsetOf(full),
      s"TTL emitted a (doc, text) pair the full stream would not: ${ttl.diff(full)}")
    val lost = full.diff(ttl)
    assert(lost.forall { case (d, t, _) => !recent(d, t) },
      "every lost pair must be out-of-window (recoverable from the archive): " +
        lost.filter { case (d, t, _) => recent(d, t) })
    assert(full.filter { case (d, t, _) => recent(d, t) }.subsetOf(ttl),
      "every in-window pair must survive the TTL with the same jaccard")
    assert(lost.nonEmpty, "the sparse family must lose at least one pair")
  }

  test("idle state drains to ZERO index entries (the non-TTL twin keeps every distinct text)") {
    val docs = (0 until 120).map { i =>
      val fam = i % 20
      StreamDoc(i.toLong, at(i * 5),
        s"alpha$fam beta$fam gamma$fam delta$fam epsilon$fam")
    }
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-ttl-state").toString
    val input = MemoryStream[StreamDoc]
    val q = DedupStream.matchesWithTtl(input.toDS(), threshold, ttlStr,
        watermark = "60 seconds")
      .writeStream.format("memory").queryName("dttl_drain")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    docs.grouped(30).foreach { b => input.addData(b); q.processAllAvailable() }
    // the sentinel advances the watermark a year past the corpus: every
    // entry is idle beyond the TTL, every bucket timeout fires
    input.addData(farFuture); q.processAllAvailable()
    q.stop()
    val state = spark.read.format("statestore").load(ckpt)
    val entries = state.selectExpr(
      "coalesce(sum(size(value.groupState.indexed)), 0L)")
      .collect()(0).getLong(0)
    assert(entries == 0L,
      s"all entries idle past the TTL must be swept, got $entries")
    // only the sentinel's own buckets may still hold state (its doc is
    // buffered, never sealed); every drained bucket's row is GONE
    val rows = state.count()
    val sentinelBuckets = DedupStream.bandKeys(farFuture.text, 16, 4).size
    assert(rows <= sentinelBuckets,
      s"drained buckets must drop their state row: $rows rows > $sentinelBuckets")
  }
}
