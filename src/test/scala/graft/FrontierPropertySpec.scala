package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{DedupStream, IndexEntry}

/** Pure-function property certification of the exact-collapse frontier
  * (streaming/DedupStream): whatever order occurrences of one distinct
  * text arrive in — in event-time order or arbitrarily late — the
  * frontier must answer every tie-break query exactly like the brute
  * model that keeps EVERY occurrence:
  *
  *   bestPrior(frontier, q) == min id among ALL occurrences (ots, oid)
  *                             with (ots, oid) < (qts, qid)
  *
  * This is the algebra the stream-level specs (brute replay across
  * randomized splits) exercise only on corpora whose ids correlate with
  * event time; here ids and timestamps are independently random, so the
  * late-copy-with-smaller-id cases get dense coverage.
  */
class FrontierPropertySpec extends AnyFunSuite {

  private val toks = Array("a", "b")

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  test("frontier answers every prior-min-id query like the keep-everything brute") {
    val rnd = new scala.util.Random(11)
    (1 to 300).foreach { trial =>
      val n = rnd.nextInt(12) + 1
      // distinct ids, timestamps drawn from a SMALL range so ties and
      // inversions (late small-id copies) are common
      val occs = rnd.shuffle((0 until 40).toList).take(n)
        .map(id => (rnd.nextInt(6).toLong, id.toLong))
      val entry = occs.foldLeft(IndexEntry(toks, Nil)) {
        case (e, (ts, id)) => DedupStream.insertOcc(e, ts, id)
      }
      // structural invariants: ascending (ts, id), strictly decreasing id
      entry.occs.sliding(2).foreach {
        case List(a, b) =>
          assert(lt(a, b), s"trial $trial: occs not ascending: ${entry.occs}")
          assert(a._2 > b._2, s"trial $trial: ids not strictly decreasing: ${entry.occs}")
        case _ =>
      }
      // every query point (including the occs themselves and fresh points)
      val queries = occs ++ List.fill(8)((rnd.nextInt(7).toLong, rnd.nextInt(45).toLong))
      queries.foreach { q =>
        val brute = occs.filter(o => lt(o, q)).map(_._2).minOption
        val got = DedupStream.bestPrior(entry.occs, q._1, q._2).map(_._2)
        assert(got == brute,
          s"trial $trial: query $q over $occs → frontier ${entry.occs}: got $got, brute $brute")
      }
    }
  }

  test("in-order ingest keeps exactly one occurrence per distinct text") {
    val occs = (0 until 20).map(i => (i.toLong, (100 + i).toLong))
    val entry = occs.foldLeft(IndexEntry(toks, Nil)) {
      case (e, (ts, id)) => DedupStream.insertOcc(e, ts, id)
    }
    assert(entry.occs == List((0L, 100L)),
      s"ids increasing with event time must collapse to the first copy: ${entry.occs}")
  }
}
