package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin
import graft.plans.AsofMergeJoin

/** The native as-of operator (custom LogicalPlan + Strategy + physical
  * merge) must agree exactly with the composed union+window operator on
  * real data, and plan as a single merge with one Exchange+Sort per side.
  */
class AsofMergeJoinSpec extends SparkSpec {

  test("native as-of picks latest right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 20L, 2.5), ("B", 5L, 9.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", 9L, 100L), ("A", 10L, 200L), ("A", 25L, 300L), ("B", 5L, 400L),
      ("C", 7L, 500L))
      .toDF("sym", "tts", "qty")
    val got = AsofMergeJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
        tieBreak = Seq("px"))
      .select("sym", "tts", "qty", "asof_ts", "asof_px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(got == Set(
      ("A", 9L, 100L, None, None),
      ("A", 10L, 200L, Some(10L), Some(1.0)),
      ("A", 25L, 300L, Some(20L), Some(2.5)),
      ("B", 5L, 400L, Some(5L), Some(9.0)),
      ("C", 7L, 500L, None, None)), s"unexpected native as-of result: $got")
  }

  test("native as-of supports composite keys") {
    import spark.implicits._
    val quotes = Seq(("A", 1L, 10L, 1.0), ("A", 2L, 10L, 2.0), ("B", 1L, 5L, 9.0))
      .toDF("sym", "venue", "qts", "px")
    val trades = Seq(("A", 1L, 11L, 100L), ("A", 2L, 11L, 200L), ("B", 2L, 11L, 300L))
      .toDF("sym", "venue", "tts", "qty")
    val got = AsofMergeJoin.backward(trades, quotes, Seq("sym", "venue"), "tts", "qts")
      .select("sym", "venue", "qty", "asof_px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), Option(r.get(3)))).toSet
    assert(got == Set(
      ("A", 1L, 100L, Some(1.0)),   // (A,1) matches only venue-1 quote
      ("A", 2L, 200L, Some(2.0)),
      ("B", 2L, 300L, None)),       // (B,2) has no quote despite B having one at venue 1
      s"composite keys must not cross-match: $got")
  }

  test("null join keys never match in either operator (SQL equi-join semantics)") {
    import spark.implicits._
    // the null-key right row must be carried into NO left row, and the
    // null-key left rows must emit unmatched — not pair up with each
    // other the way a partition-by-key or null-tolerant key ordering
    // would naturally group them
    val right = Seq((Option(1L), 10L, 1.0), (Option.empty[Long], 5L, 9.0))
      .toDF("k", "rts", "px")
    val left = Seq((Option(1L), 20L, 1L), (Option.empty[Long], 20L, 2L))
      .toDF("k", "lts", "l_id")
    val expected = Set(
      (1L, Option[Any](1.0)), // matches the k=1 quote
      (2L, Option.empty[Any])) // null key: never matches, emits unmatched
    for ((name, run) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "native" -> (() => AsofMergeJoin.backward(left, right, Seq("k"), "lts", "rts")),
        "composed" -> (() => AsofJoin.backward(left, right, Seq("k"), "lts", "rts")))) {
      val got = run().select("l_id", "asof_px")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
      assert(got == expected, s"$name operator null-key semantics: $got")
    }
  }

  test("native as-of agrees exactly with the composed operator on real events") {
    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("p_id"), col("asof_ts"), col("asof_event_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet

    val native = rows(AsofMergeJoin.backward(purchases, clicks,
      Seq("user_id"), "ts", "ts", tieBreak = Seq("event_id")))
    val composed = rows(AsofJoin.backward(purchases, clicks,
      Seq("user_id"), "ts", "ts", tieBreak = Seq("event_id")))
    assert(native.nonEmpty && native == composed,
      s"native ${native.size} rows vs composed ${composed.size}")
  }

  test("property: native == composed == brute force on random inputs") {
    import spark.implicits._
    // deterministic pseudo-random corpus: duplicate (key, ts) pairs on
    // both sides, keys missing from either side, ties, empty-ish keys
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(6)
      // ~10% null timestamps AND ~10% null keys on both sides: SQL
      // three-valued comparison means a null ts can neither match nor
      // be matched, and a null key equals nothing (not even null)
      def ts(): Option[Long] =
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(40).toLong)
      def key(bound: Int): Option[Long] =
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(bound).toLong)
      val lefts = Seq.fill(30 + rnd.nextInt(50))((key(nKeys + 2), ts()))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rights = Seq.fill(30 + rnd.nextInt(50))((key(nKeys), ts()))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1000) }
      val lDf = lefts.toDF("k", "lts", "l_id").repartition(4)
      val rDf = rights.toDF("k", "rts", "r_id").repartition(3)

      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("l_id", "asof_ts", "asof_r_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet

      val native = canon(graft.plans.AsofMergeJoin.backward(
        lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")))
      val composed = canon(AsofJoin.backward(
        lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")))
      // brute force: max (rts, r_id) right row with rts <= lts per left
      // row; null ts or null key on either side never matches
      val brute = lefts.map { case (k, lts, lid) =>
        val best = lts.filter(_ => k.isDefined).map(l => rights
            .filter(r => r._1 == k && r._2.exists(_ <= l))
            .sortBy(r => (r._2.get, r._3)).lastOption)
          .getOrElse(None)
        (lid, best.flatMap(_._2), best.map(_._3))
      }.map { case (a, b, c) => (a, b.map(_.asInstanceOf[Any]), c.map(_.asInstanceOf[Any])) }.toSet

      assert(native == brute, s"round $round: native disagrees with brute force")
      assert(composed == brute, s"round $round: composed disagrees with brute force")
    }
  }

  test("native forward picks the earliest right row at or after each left ts") {
    import spark.implicits._
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 20L, 2.5), ("B", 5L, 9.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", 9L, 100L), ("A", 20L, 200L), ("A", 25L, 300L), ("B", 5L, 400L),
      ("C", 7L, 500L))
      .toDF("sym", "tts", "qty")
    val got = AsofMergeJoin.forward(trades, quotes, Seq("sym"), "tts", "qts",
        tieBreak = Seq("px"))
      .select("sym", "tts", "qty", "asof_ts", "asof_px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(got == Set(
      ("A", 9L, 100L, Some(10L), Some(1.0)),
      ("A", 20L, 200L, Some(20L), Some(2.0)),  // inclusive >=; min-px tie
      ("A", 25L, 300L, None, None),
      ("B", 5L, 400L, Some(5L), Some(9.0)),
      ("C", 7L, 500L, None, None)), s"unexpected native forward result: $got")
  }

  test("native forward agrees with the composed forward on random nullable inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 3) {
      val nKeys = 1 + rnd.nextInt(5)
      def opt(bound: Int): Option[Long] =
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(bound).toLong)
      val lDf = Seq.fill(40)((opt(nKeys + 2), opt(40))).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "lts", "l_id").repartition(4)
      val rDf = Seq.fill(40)((opt(nKeys), opt(40))).zipWithIndex
        .map { case ((k, t), i) => (k, t, i.toLong + 1000) }
        .toDF("k", "rts", "r_id").repartition(3)
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("l_id", "asof_ts", "asof_r_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
      val native = canon(AsofMergeJoin.forward(
        lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")))
      val composed = canon(AsofJoin.forward(
        lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")))
      assert(native == composed, s"round $round: native forward diverges from composed")
    }
  }

  test("native within agrees with composed within on both directions") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lDf = Seq.fill(60)((rnd.nextInt(4).toLong, rnd.nextInt(50).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      .toDF("k", "lts", "l_id").repartition(4)
    val rDf = Seq.fill(60)((rnd.nextInt(4).toLong, rnd.nextInt(50).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1000) }
      .toDF("k", "rts", "r_id").repartition(3)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("l_id", "asof_ts", "asof_r_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    for (tol <- Seq(0L, 3L, 100L)) {
      val nb = canon(AsofMergeJoin.within(AsofMergeJoin.backward(
        lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")), "lts", tol))
      val cb = canon(AsofJoin.within(AsofJoin.backward(
        lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")), "lts", tol))
      assert(nb == cb, s"backward within($tol) diverges")
      val nf = canon(AsofMergeJoin.within(AsofMergeJoin.forward(
        lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")), "lts", tol))
      val cf = canon(AsofJoin.within(AsofJoin.forward(
        lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")), "lts", tol))
      assert(nf == cf, s"forward within($tol) diverges")
      // tolerance must only ever null matches out, never add them —
      // in BOTH directions (a forward-specific asymmetric-bound bug
      // would slip past the native==composed check, which compares the
      // same shared implementation to itself)
      assert(nb.flatMap(t => t._2.map(_ => t._1))
        .subsetOf(canon(AsofMergeJoin.backward(
          lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")))
          .flatMap(t => t._2.map(_ => t._1))))
      assert(nf.flatMap(t => t._2.map(_ => t._1))
        .subsetOf(canon(AsofMergeJoin.forward(
          lDf, rDf, Seq("k"), "lts", "rts", tieBreak = Seq("r_id")))
          .flatMap(t => t._2.map(_ => t._1))))
    }
  }

  test("native as-of plans one merge node with one Exchange+Sort per side") {
    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
    val df = AsofMergeJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalSection = finalPlanSection(plan)
    assert(finalSection.contains("AsofMergeJoin"), finalSection.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(finalSection).size == 2,
      s"expected exactly two hash Exchanges: ${finalSection.take(800)}")
  }
}
