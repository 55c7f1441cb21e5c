package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Bpe

/** BPE trainer/applier vs a brute single-node reference: the learned
  * merge list and the per-doc tokenization must be IDENTICAL — the
  * distributed vocab-table iteration is an implementation detail, not a
  * semantics change. (Round 1's pair statistic is separately
  * oracle-certified cross-engine as `text_bpe_pairs`.)
  */
class BpeSpec extends SparkSpec {

  // ---- brute reference (plain collections, the paper's algorithm) ----

  private def bruteWords(texts: Seq[String]): Seq[String] =
    texts.flatMap(_.split(" ", -1)).filter(_.nonEmpty)

  private def bruteMergePass(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def bruteLearn(texts: Seq[String], n: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = bruteWords(texts)
      .groupBy(identity).map { case (w, ws) =>
        w.split("").filter(_.nonEmpty).toList -> ws.size.toLong }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 0
    var done = false
    while (i < n && !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
        pc((syms(j), syms(j + 1))) = pc.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (pc.isEmpty) done = true
      else {
        // arg-max: count desc, then pair lexicographic (the house tie-break)
        val (pair, _) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        vocab = vocab.groupBy { case (syms, _) =>
          bruteMergePass(syms, pair._1, pair._2) }
          .map { case (syms, m) => syms -> m.values.sum }
      }
      i += 1
    }
    merges.toSeq
  }

  private def bruteTokenize(word: String, merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(word.split("").filter(_.nonEmpty).toList) {
      case (syms, (a, b)) => bruteMergePass(syms, a, b)
    }

  // ---- specs ----

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val texts: Seq[String] =
    docs.select("text").collect().map(_.getString(0)).toSeq

  test("mergePass fold replays the reference greedy scan on the trap cases") {
    import spark.implicits._
    val cases = Seq(
      ("aaa", "a", "a"),   // overlapping pair: greedy takes the first
      ("aab", "a", "b"),   // pair at the end
      ("abb", "a", "b"),   // merged token must not re-merge with next b
      ("abab", "a", "b"),  // two disjoint merges in one pass
      ("a", "a", "b"))     // single char: untouched
    cases.foreach { case (w, a, b) =>
      val viaSpark = Seq(w).toDF("w")
        .select(Bpe.tokenizeWord(col("w"), Seq((a, b))).as("t"))
        .head().getSeq[String](0).toList
      assert(viaSpark == bruteMergePass(w.split("").filter(_.nonEmpty).toList, a, b),
        s"$w with ($a,$b): $viaSpark")
    }
  }

  test("learn: the distributed vocab iteration reproduces the brute merge list exactly") {
    val n = 12
    val spark12 = Bpe.learn(docs, "text", n)
    val brute12 = bruteLearn(texts, n)
    assert(spark12 == brute12,
      s"merge lists diverge:\n spark=$spark12\n brute=$brute12")
  }

  test("applyMerges tokenizes every document identically to the brute reference") {
    val merges = bruteLearn(texts, 8)
    val got = Bpe.applyMerges(docs, "text", "doc_id", merges)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val exp = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) ->
        r.getString(1).split(" ", -1).filter(_.nonEmpty).toList
          .flatMap(w => bruteTokenize(w, merges))
    }.toMap
    assert(got.size == exp.size)
    val bad = exp.keys.filter(k => got(k) != exp(k))
    assert(bad.isEmpty, s"docs diverge: ${bad.take(3).map(k => (k, got(k), exp(k)))}")
    // and the token count column is the sequence length
    val n = Bpe.applyMerges(docs, "text", "doc_id", merges)
      .filter(size(col("bpe_tokens")) =!= col("n_bpe_tokens")).count()
    assert(n == 0)
    // the native BpeEncode path (the default) ≡ the fold-chain reference
    val refRows = Bpe.applyMergesReference(docs, "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(refRows == got,
      "native expression and declarative fold chain must tokenize identically")
  }

  test("learnLocal (the 100 TB trainer shape) reproduces the distributed merge list") {
    val n = 12
    assert(Bpe.learnLocal(docs, "text", n) == bruteLearn(texts, n))
    assert(Bpe.learnLocal(docs, "text", n) == Bpe.learn(docs, "text", n))
  }

  test("round-1 statistic agrees with the text_bpe_pairs oracle key's top pair") {
    val topKey = operators.TextAnalysisQueries.bpePairsCore(docs)
      .head()
    val firstMerge = Bpe.learn(docs, "text", 1).head
    assert(topKey.getString(0) == firstMerge._1 + firstMerge._2,
      s"key top pair ${topKey.getString(0)} vs first merge $firstMerge")
  }
}
