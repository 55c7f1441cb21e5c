package graft

import org.apache.spark.sql.functions._

/** Certifies the count-of-counts decomposition behind
  * `text_vocab_coverage` beyond the oracle corpus: the class-table
  * boundary split must equal the naive global-rank computation on
  * arbitrary (tie-heavy) vocabularies, including budgets past the vocab
  * size.
  */
class VocabCoverageSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def brute(tokens: Seq[String], k: Int): (Long, Double) = {
    val byType = tokens.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    // token coverage is rank-order-invariant within a count class, so
    // ANY total order that sorts by count desc gives the same coverage
    val sorted = byType.sortBy { case (w, c) => (-c, w) }
    val covered = sorted.take(k).map(_._2).sum
    val total = byType.map(_._2).sum
    (covered, BigDecimal(covered.toDouble / total.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("coverage curve equals the naive global-rank computation on random tie-heavy corpora") {
    val rnd = new scala.util.Random(9)
    import spark.implicits._
    for (trial <- 1 to 4) {
      // skewed synthetic corpus: ~40 types, zipf-ish counts, heavy ties
      val vocabSize = 20 + rnd.nextInt(40)
      val tokens = (0 until vocabSize).flatMap { i =>
        val c = 1 + (vocabSize / (i + 1)) + rnd.nextInt(3)
        Seq.fill(c)(f"w$i%03d")
      }
      val docs = tokens.grouped(7).map(_.mkString(" ")).toSeq
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val ks = Seq(1L, 3L, 17L, vocabSize.toLong, vocabSize + 500L)
      val ksDf = ks.toDF("k")
      val got = graft.operators.TextAnalysisQueries
        .vocabCoverageCore(docs, ksDf)
        .orderBy("k").collect()
      assert(got.length == ks.size, s"trial $trial: one row per budget")
      got.foreach { case Row(k: Long, covered: Long, coverage: Double) =>
        val (expCovered, expCoverage) = brute(tokens, k.toInt)
        assert(covered == expCovered,
          s"trial $trial k=$k: covered $covered != brute $expCovered")
        assert(coverage == expCoverage,
          s"trial $trial k=$k: coverage $coverage != brute $expCoverage")
      }
    }
  }

  test("evt_drift_psi bins partition the corpus and PSI terms match a driver-side replay") {
    val rows = SparkEntry.queries("evt_drift_psi")(spark, sf).collect()
    val events = Tables.events(spark, sf)
      .select(col("value"), col("ts")).collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    val split = 1705363200L * 1000000000L
    val binned = events.map { case (v, ts) =>
      (math.min(9L, math.round(v * 100) * 10 / 50000), ts < split)
    }
    assert(rows.map(_.getLong(1)).sum == binned.count(_._2),
      "ref counts must cover every pre-split event")
    assert(rows.map(_.getLong(2)).sum == binned.count(!_._2),
      "cur counts must cover every post-split event")
    val refT = binned.count(_._2).toLong
    val curT = binned.size - refT
    rows.foreach { r =>
      val bin = r.getLong(0)
      val refN = binned.count(e => e._1 == bin && e._2).toLong
      val curN = binned.count(e => e._1 == bin && !e._2).toLong
      assert(r.getLong(1) == refN && r.getLong(2) == curN, s"bin $bin counts")
      val pr = (refN + 1).toDouble / (refT + 10).toDouble
      val pc = (curN + 1).toDouble / (curT + 10).toDouble
      val term = BigDecimal((pc - pr) * math.log(pc / pr))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == term, s"bin $bin psi term ${r.getDouble(3)} != $term")
    }
  }
}
