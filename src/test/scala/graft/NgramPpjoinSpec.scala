package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupQueries

/** r16: the PPJoin prefix-filtered char-3-gram Jaccard join must return
  * EXACTLY the pairs of the r15 gram-equi-join shape it replaced — the
  * prefix filter is an exact candidate superset (two sets with J ≥ t
  * share their globally-smallest common gram inside both prefixes), so
  * any divergence is a bug in the prefix/size arithmetic, not noise.
  */
class NgramPpjoinSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("a_id", "b_id").collect().map(_.toSeq).toSeq

  test("ppjoin equals the gram-join shape on the live fixture corpus") {
    val docs = Tables.documents(spark, sf)
    val pp = sortedRows(DedupQueries.ngramJaccardPpjoin(docs))
    val gj = sortedRows(DedupQueries.ngramJaccardGramJoin(docs))
    assert(pp.nonEmpty, "vacuous fixture: no near-dup pairs at this SF")
    assert(pp == gj)
  }

  test("ppjoin equals the gram-join shape on a hot-boilerplate corpus") {
    // The adversarial shape for prefix filtering: a boilerplate sentence
    // shared by EVERY doc (its grams are maximally hot, df = n_docs) +
    // per-doc unique content, with planted near-dup pairs that differ
    // only in a suffix character. Prefixes must pick the rare content
    // grams and still catch every planted pair.
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0 until 60).map { i =>
      val payload =
        if (i % 3 == 2) s"unique${i - 1}content${(i - 1) * 7}xyz${i - 1}q" // near-dup of i-1
        else s"unique${i}content${i * 7}xyz${i}z"
      (i.toLong, s"$boiler $payload")
    }.toDF("doc_id", "text")
    val pp = sortedRows(DedupQueries.ngramJaccardPpjoin(docs))
    val gj = sortedRows(DedupQueries.ngramJaccardGramJoin(docs))
    assert(gj.nonEmpty, "vacuous: the planted near-dups must pass 0.8")
    assert(pp == gj)
  }

  test("ppjoin handles 1-gram and exact-duplicate edge docs") {
    val docs = Seq(
      (1L, "abc"),            // exactly one gram
      (2L, "abc"),            // its exact duplicate (jac = 1.0)
      (3L, "ab"),             // below the length-3 floor — excluded
      (4L, "zzzzzzzz"),       // one DISTINCT gram from many positions
      (5L, "zzzzzzzzz")       // same single gram set (jac = 1.0)
    ).toDF("doc_id", "text")
    val pp = sortedRows(DedupQueries.ngramJaccardPpjoin(docs))
    val gj = sortedRows(DedupQueries.ngramJaccardGramJoin(docs))
    assert(pp == gj)
    assert(pp.map(r => (r(0), r(1))) == Seq((1L, 2L), (4L, 5L)))
  }
}
