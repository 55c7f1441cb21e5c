package graft

/** Every declared query must execute on sf0.001, produce a stable schema,
  * and be paired 1:1 with oracle SQL (SparkEntry contract).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("oracleSql keys exactly match queries keys") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("no duplicate keys across packs") {
    // Map construction would silently drop duplicates; sizes must add up.
    // Reads SparkEntry's own pack list so a newly registered pack can't
    // drift from this check.
    val expected = SparkEntry.packs.map(_.queries.size).sum
    assert(SparkEntry.queries.size == expected)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes on sf0.001 with a non-empty schema") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("dedup_exact finds the duplicate texts at sf0.1 (8 dups known)") {
    val df = SparkEntry.queries("dedup_exact")(spark, "/root/testdata/sf0.1")
    val dups = df.filter(org.apache.spark.sql.functions.col("n_copies") > 1).count()
    assert(dups > 0 && dups <= 8)
  }

  test("sim_cosine_topk puts the probe itself first with sim 1.0") {
    val rows = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.head.getLong(0) == 0L)
    assert(math.abs(rows.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("sim_quantized_topk ranks the probe first and recalls most exact neighbors") {
    val q = SparkEntry.queries("sim_quantized_topk")(spark, sf).collect()
    assert(q.length == 10)
    assert(q.head.getLong(0) == 0L, "the probe must be its own best match")
    // int8 quantization should preserve the neighborhood: ≥7/10 overlap
    // with the exact cosine top-10 (same probe, same corpus)
    val exact = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val recall = q.map(_.getLong(0)).count(exact.contains)
    assert(recall >= 7, s"quantized top-10 recalled only $recall/10 exact neighbors")
  }

  test("text_chunk reassembles every document exactly") {
    import org.apache.spark.sql.functions._
    val chunks = SparkEntry.queries("text_chunk")(spark, sf).collect()
      .groupBy(_.getLong(0))
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
    assert(chunks.nonEmpty)
    docs.foreach { d =>
      val expected = d.getString(1).split(" ").filter(_.nonEmpty)
      val got = chunks(d.getLong(0)).sortBy(_.getLong(1))
      // chunk texts concatenate back to the filtered token stream
      assert(got.map(_.getString(3)).filter(_.nonEmpty).mkString(" ") == expected.mkString(" "),
        s"doc ${d.getLong(0)} does not reassemble")
      // token counts sum to the doc's token count, every chunk ≤ 64
      assert(got.map(_.getLong(2)).sum == expected.length.toLong)
      assert(got.forall(_.getLong(2) <= 64L))
    }
  }

  test("text_contamination finds only cross-split pairs above the threshold") {
    val rows = SparkEntry.queries("text_contamination")(spark, sf).collect()
    assert(rows.nonEmpty, "the synthetic corpus has known duplicates — some must straddle the split")
    rows.foreach { r =>
      val (c, e) = (r.getLong(0), r.getLong(1))
      assert(c % 7 != 0 && e % 7 == 0, s"($c,$e) violates the corpus/eval split")
      assert(r.getDouble(3) >= 0.5 && r.getDouble(3) <= 1.0)
    }
  }

  test("evt_ohlc matches a driver-side recompute of open/high/low/close") {
    val rows = SparkEntry.queries("evt_ohlc")(spark, sf).collect()
    assert(rows.nonEmpty)
    val hourNs = 3600000000000L
    val raw = Tables.events(spark, sf)
      .select("event_type", "ts", "event_id", "value").collect()
      .groupBy(r => (r.getString(0), Math.floorDiv(r.getLong(1), hourNs)))
    rows.foreach { r =>
      val g = raw((r.getString(0), r.getAs[Long]("hour")))
        .sortBy(x => (x.getLong(1), x.getLong(2)))
      assert(r.getAs[Double]("open") == g.head.getDouble(3), "open")
      assert(r.getAs[Double]("close") == g.last.getDouble(3), "close")
      assert(r.getAs[Double]("high") == g.map(_.getDouble(3)).max, "high")
      assert(r.getAs[Double]("low") == g.map(_.getDouble(3)).min, "low")
      assert(r.getAs[Long]("n") == g.length.toLong)
    }
  }

  test("win_fill_forward carries the latest click per user, one user-key shuffle") {
    val df = SparkEntry.queries("win_fill_forward")(spark, sf)
    // recompute the forward fill driver-side at sf0.001
    val raw = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .groupBy(_.getLong(0))
    val expected = raw.toSeq.flatMap { case (_, g) =>
      var lastClick: Option[Double] = None
      g.sortBy(r => (r.getLong(1), r.getLong(2))).toSeq.map { r =>
        if (r.getString(3) == "click") lastClick = Some(r.getDouble(4))
        r.getLong(2) -> lastClick
      }
    }
    val got = df.collect().map(r =>
      r.getAs[Long]("event_id") ->
        (if (r.isNullAt(2)) None else Some(r.getAs[Double]("last_click")))).toMap
    expected.foreach { case (id, exp) =>
      assert(got(id) == exp, s"event $id: got ${got(id)}, expected $exp")
    }
    // one hash Exchange (user_id) — the presentation sort is range-partitioned
    val p = finalPlanSection(finalizedPlan(df))
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 1, s"forward fill needs exactly one hash shuffle, got $n")
  }

  test("join_asof: every matched click precedes or equals its purchase") {
    SparkEntry.queries("join_asof")(spark, sf).collect()
      .foreach(r => assert(r.getLong(3) >= 0, s"negative gap for ${r.getLong(0)}"))
  }

  test("agg_histogram buckets partition the orders table exactly") {
    val rows = SparkEntry.queries("agg_histogram")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("bucket_lo_usd") == r.getAs[Long]("bucket") * 25000)
      val (lo, hi) = (r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))
      assert(lo >= r.getAs[Long]("bucket") * 2500000 &&
        hi < (r.getAs[Long]("bucket") + 1) * 2500000)
    }
  }

  test("evt_zscore emits only |z| > 2.5 and they really are rare") {
    val rows = SparkEntry.queries("evt_zscore")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("z")) > 2.5))
    assert(rows.length < Tables.events(spark, sf).count() / 10,
      "an outlier filter that keeps >10% of rows is not flagging outliers")
  }

  test("text_bigram_pmi: every pair clears the support floor; PMI is finite") {
    val rows = SparkEntry.queries("text_bigram_pmi")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("c12") >= 10)
      assert(!r.getAs[Double]("pmi").isNaN && !r.getAs[Double]("pmi").isInfinite)
    }
  }

  test("evt_session durations are non-negative and bounded by the month") {
    SparkEntry.queries("evt_session")(spark, sf).collect()
      .foreach { r =>
        val d = r.getLong(3)
        assert(d >= 0 && d < 32L * 24 * 3600)
      }
  }
}
