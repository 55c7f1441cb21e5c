package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A document arriving on the ingest stream. */
case class StreamDoc(doc_id: Long, ts: Timestamp, text: String)

/** One per-bucket candidate: arriving doc `doc_id` confirmed ≥ threshold
  * against prior doc `o_id`. The same pair can surface from several
  * band buckets (identical jaccard each time); [[DedupStream.bestMatches]]
  * reduces the emissions to one best prior per doc.
  */
case class BucketMatch(doc_id: Long, o_id: Long, jaccard: Double)

/** Per-bucket state: the sealed LSH index slice (ts kept so a LATE
  * arrival — FMGWS receives rows behind the watermark rather than
  * dropping them — still matches only its event-time priors) + the
  * watermark-buffered arrivals. Both lists carry (tsMs, doc_id, tokens).
  */
case class DedupBucketState(indexed: List[(Long, Long, Array[String])],
                            pending: List[(Long, Long, Array[String])])

/** One (bucket, doc) fan-out record. Flat — the watermark must tag a
  * TOP-LEVEL ts column, which a typed flatMap's nested tuple would lose.
  */
case class BucketDoc(bucket: Long, doc_id: Long, ts: Timestamp, text: String)

/** Streaming dedup-on-ingest (the real-time form of the
  * `dedup_incremental` batch key, SURVEY.md §2.9): every arriving doc is
  * matched against ALL event-time-prior docs — the continuously-growing
  * corpus — and then becomes part of the index itself. This is the
  * continuous-crawl shape: there is no batch/corpus boundary, the corpus
  * IS the stream's past.
  *
  * Mechanics (the AsofStream/RetentionStream discipline):
  *  - each doc fans out to its `bands` LSH band buckets
  *    (`flatMap` before the keyed state), so candidate generation is
  *    per-bucket co-occurrence — never doc × history;
  *  - arrivals buffer per bucket until the watermark passes their ts
  *    (out-of-order and cross-batch interleavings then cannot change
  *    any doc's "prior" set — emission is order-independent, which the
  *    spec certifies across randomized splits);
  *  - sealed docs process in (ts, doc_id) order: match against the
  *    bucket's index plus earlier-sealed batchmates, emit confirmed
  *    candidates, then join the index;
  *  - an event-time timeout re-fires quiet buckets so buffered docs
  *    still seal.
  *
  * State: the per-bucket token index grows with the stream — that is
  * the operator's honest cost, identical to the persisted LSH index a
  * batch pipeline maintains (pipeline/Dedup.incrementalBestMatch
  * documents the same), not a leak. A deployment bounds it the same way
  * batch does: exact-collapse upstream (dedup verbatim copies before
  * indexing) and periodic compaction of the sink.
  */
object DedupStream {

  /** Deterministic 64-bit mix (splitmix64 finalizer) — stable across
    * runs/JVMs, which keeps the spec's brute replay exact.
    */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private[graft] def tokensOf(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty).distinct

  /** Band bucket keys for a doc: k-component minhash over token hashes,
    * hashed per band slice. Pure function of the text — the spec replays
    * it for the brute expectation.
    */
  private[graft] def bandKeys(text: String, k: Int, bands: Int): Seq[Long] = {
    val toks = tokensOf(text)
    val base = toks.map(t => mix(t.hashCode.toLong))
    val sig = Array.tabulate(k) { j =>
      if (base.isEmpty) Long.MinValue
      else base.map(h => mix(h ^ mix(j.toLong))).min
    }
    val rows = k / bands
    (0 until bands).map { b =>
      val slice = sig.slice(b * rows, (b + 1) * rows)
      // fold the band slice to one key; include the band id so equal
      // slices in different bands cannot collide into one bucket
      slice.foldLeft(mix(b.toLong))((acc, h) => mix(acc ^ h))
    }.distinct
  }

  private[graft] def jaccard(a: Array[String], b: Array[String]): Double = {
    val sa = a.toSet
    val inter = b.count(sa.contains)
    inter.toDouble / (a.length + b.length - inter)
  }

  /** The candidate stream. Input needs no prior watermark — one is set
    * here on `ts`.
    */
  def matches(docs: Dataset[StreamDoc], threshold: Double,
              k: Int = 16, bands: Int = 4,
              watermark: String = "10 minutes"): Dataset[BucketMatch] = {
    require(k % bands == 0, s"k=$k must divide into $bands bands")
    import docs.sparkSession.implicits._
    docs
      // fan out BEFORE the watermark: the tag must sit on a top-level
      // column of the dataset that reaches the stateful operator.
      // Token-less docs (empty/whitespace text) are dropped here: they
      // all share the identical all-MinValue signature, so indexing them
      // would funnel every empty doc into the same band buckets — O(n²)
      // state and pairwise work for zero possible emissions (jaccard is
      // NaN, never ≥ threshold). Dropping them changes no output.
      .flatMap(d =>
        if (tokensOf(d.text).isEmpty) Nil
        else bandKeys(d.text, k, bands)
          .map(b => BucketDoc(b, d.doc_id, d.ts, d.text)))
      .withWatermark("ts", watermark)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[DedupBucketState, BucketMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[BucketDoc], state: GroupState[DedupBucketState]) =>
          val st = state.getOption.getOrElse(DedupBucketState(Nil, Nil))
          val arrivals = rows.map { d =>
            (d.ts.getTime, d.doc_id, tokensOf(d.text))
          }.toList
          val wm = state.getCurrentWatermarkMs()
          // STRICTLY below: a doc with ts == wm can still be admitted,
          // and it must sort into the prior set of any same-ts doc with
          // a higher id before that one seals
          val (sealedNow, pending) =
            (st.pending ++ arrivals).partition(_._1 < wm)
          var index = st.indexed
          val out = sealedNow.sortBy(x => (x._1, x._2)).flatMap {
            case (ts, id, toks) =>
              // event-time priors only: a late doc (sealed behind its
              // peers) must not match docs from its event-time future —
              // the only late-data deviation is a MISSED match on docs
              // already emitted, never a wrong one
              val hits = index.flatMap { case (ots, oid, otoks) =>
                if (ots > ts || (ots == ts && oid >= id)) None
                else {
                  val j = jaccard(toks, otoks)
                  if (j >= threshold) Some(BucketMatch(id, oid, j)) else None
                }
              }
              index = (ts, id, toks) :: index
              hits
          }
          state.update(DedupBucketState(index, pending))
          // quiet buckets: wake when the earliest buffered doc can seal
          pending.map(_._1).minOption.foreach(t =>
            state.setTimeoutTimestamp(math.max(t + 1, wm + 1)))
          out.iterator
      }
  }

  /** Reduce the candidate emissions (streamed to any sink) to each doc's
    * best prior: max jaccard, min prior id on ties — the
    * dedup_incremental tie-break. Batch helper over the sink table; the
    * candidate stream itself stays append-mode exactly-once.
    */
  def bestMatches(candidates: DataFrame): DataFrame =
    candidates
      .groupBy(col("doc_id"))
      .agg(max_by(struct(col("o_id"), col("jaccard")),
        struct(col("jaccard"), (-col("o_id")).as("neg"))).as("b"))
      .select(col("doc_id"), col("b.o_id").as("dup_of"),
        col("b.jaccard").as("jaccard"))
}
