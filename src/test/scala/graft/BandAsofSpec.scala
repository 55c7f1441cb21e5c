package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin
import graft.pipeline.BandJoin

/** Library as-of and band joins: semantics vs brute-force oracles built
  * from cross joins on small data, plus the plan property that makes
  * BandJoin the at-scale shape (equi-join, not nested-loop).
  */
class BandAsofSpec extends SparkSpec {

  test("AsofJoin.backward picks the latest right row at or before each left ts") {
    import spark.implicits._
    val quotes = Seq( // key, ts, px
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 20L, 2.5), ("B", 5L, 9.0))
      .toDF("sym", "qts", "px")
    val trades = Seq( // key, ts, qty
      ("A", 9L, 100L), ("A", 10L, 200L), ("A", 25L, 300L), ("B", 5L, 400L),
      ("C", 7L, 500L))
      .toDF("sym", "tts", "qty")

    val got = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts",
        tieBreak = Seq("px"))
      .select("sym", "tts", "qty", "asof_ts", "asof_px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet

    assert(got == Set(
      ("A", 9L, 100L, None, None),               // nothing at or before 9
      ("A", 10L, 200L, Some(10L), Some(1.0)),    // inclusive >= match
      ("A", 25L, 300L, Some(20L), Some(2.5)),    // latest ts; px tiebreak max-last
      ("B", 5L, 400L, Some(5L), Some(9.0)),
      ("C", 7L, 500L, None, None)),              // key with no right rows
      s"unexpected as-of result: $got")
  }

  test("AsofJoin.backward tolerates a tieBreak name shared by both inputs") {
    import spark.implicits._
    val right = Seq(("A", 10L, 5L, 1.0), ("A", 10L, 9L, 2.0))
      .toDF("sym", "qts", "seq", "px")
    val left = Seq(("A", 11L, 77L)).toDF("sym", "tts", "seq")
    val out = AsofJoin.backward(left, right, Seq("sym"), "tts", "qts",
        tieBreak = Seq("seq"))
      .select("sym", "tts", "seq", "asof_px", "asof_seq").collect()
    assert(out.length == 1)
    // left's own seq survives; the carried payload is the max-tiebreak row
    assert(out.head.getLong(2) == 77L && out.head.getDouble(3) == 2.0 &&
      out.head.getLong(4) == 9L)
  }

  test("AsofJoin.backward matches a brute-force oracle on real events") {
    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))

    val got = AsofJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts",
        tieBreak = Seq("event_id"))
      .select(col("p_id"), col("asof_event_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    // brute force: max (ts, event_id) click at or before each purchase
    val brute = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("c.ts") <= col("p.ts"),
        "left")
      .groupBy(col("p_id"))
      .agg(max(struct(col("c.ts"), col("c.event_id"))).as("best"))
      .select(col("p_id"), col("best.event_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got == brute, "as-of join must agree with the brute-force oracle")
  }

  test("AsofJoin.forward picks the earliest right row at or after each left ts") {
    import spark.implicits._
    val quotes = Seq( // key, ts, px
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 20L, 2.5), ("B", 5L, 9.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", 9L, 100L), ("A", 20L, 200L), ("A", 25L, 300L), ("B", 5L, 400L),
      ("C", 7L, 500L))
      .toDF("sym", "tts", "qty")
    val got = AsofJoin.forward(trades, quotes, Seq("sym"), "tts", "qts",
        tieBreak = Seq("px"))
      .select("sym", "tts", "qty", "asof_ts", "asof_px")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(got == Set(
      ("A", 9L, 100L, Some(10L), Some(1.0)),   // next quote after 9
      ("A", 20L, 200L, Some(20L), Some(2.0)),  // inclusive >=; min-px tie
      ("A", 25L, 300L, None, None),            // nothing at or after 25
      ("B", 5L, 400L, Some(5L), Some(9.0)),
      ("C", 7L, 500L, None, None)), s"unexpected forward as-of result: $got")
  }

  test("AsofJoin.forward matches a brute-force oracle on real events") {
    val e = Tables.events(spark, sf)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))

    val got = AsofJoin.forward(purchases, clicks, Seq("user_id"), "ts", "ts",
        tieBreak = Seq("event_id"))
      .select(col("p_id"), col("asof_event_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    // brute force: min (ts, event_id) click at or after each purchase
    val brute = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("c.ts") >= col("p.ts"),
        "left")
      .groupBy(col("p_id"))
      .agg(min(struct(col("c.ts"), col("c.event_id"))).as("best"))
      .select(col("p_id"), col("best.event_id"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got == brute, "forward as-of must agree with the brute-force oracle")
  }

  test("property: forward == brute force on random inputs with null keys and ts") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 5) {
      val nKeys = 1 + rnd.nextInt(5)
      def opt(bound: Int): Option[Long] =
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(bound).toLong)
      val lefts = Seq.fill(30 + rnd.nextInt(40))((opt(nKeys + 2), opt(40)))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rights = Seq.fill(30 + rnd.nextInt(40))((opt(nKeys), opt(40)))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong + 1000) }
      val got = AsofJoin.forward(
          lefts.toDF("k", "lts", "l_id").repartition(4),
          rights.toDF("k", "rts", "r_id").repartition(3),
          Seq("k"), "lts", "rts", tieBreak = Seq("r_id"))
        .select("l_id", "asof_ts", "asof_r_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
      // brute force: min (rts, r_id) right row with rts >= lts per left
      // row; null key or null ts on either side never matches
      val brute = lefts.map { case (k, lts, lid) =>
        val best = lts.filter(_ => k.isDefined).map(l => rights
            .filter(r => r._1 == k && r._2.exists(_ >= l))
            .sortBy(r => (r._2.get, r._3)).headOption)
          .getOrElse(None)
        (lid, best.flatMap(_._2).map(_.asInstanceOf[Any]),
          best.map(_._3.asInstanceOf[Any]))
      }.toSet
      assert(got == brute, s"round $round: forward disagrees with brute force")
    }
  }

  test("forward plans the incremental running frame, not a following-frame aggregate") {
    import spark.implicits._
    val l = Seq(("A", 1L, 1L)).toDF("k", "lts", "l_id")
    val r = Seq(("A", 2L, 9L)).toDF("k", "rts", "r_id")
    val plan = AsofJoin.forward(l, r, Seq("k"), "lts", "rts")
      .queryExecution.executedPlan.toString
    // an UnboundedFollowing frame recomputes the aggregate per row —
    // O(n²) per key partition; the reversed-ordering form stays O(n)
    assert(plan.contains("unboundedpreceding") || plan.contains("UNBOUNDED PRECEDING"),
      s"expected running frame in: ${plan.take(600)}")
    assert(!plan.toLowerCase.contains("unboundedfollowing") &&
      !plan.contains("UNBOUNDED FOLLOWING"),
      s"forward must not use a following frame: ${plan.take(600)}")
  }

  test("AsofJoin.within with explicit columns leaves a left asof_-named column alone") {
    import spark.implicits._
    val quotes = Seq(("A", 10L, 1.0)).toDF("sym", "qts", "px")
    // left carries its own asof_note column — only the join's payload
    // columns may be nulled when the caller passes them explicitly
    val trades = Seq(("A", 200L, 1L, "keep me")).toDF("sym", "tts", "t_id", "asof_note")
    val joined = AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts")
    val out = AsofJoin.within(joined, "tts", 50L, Seq("asof_ts", "asof_px"))
      .collect() match { case Array(one) => one }
    assert(out.getAs[String]("asof_note") == "keep me", s"left column clobbered: $out")
    assert(out.isNullAt(out.fieldIndex("asof_px")), "out-of-tolerance match must null")
  }

  test("AsofJoin.within is overflow-safe at the extremes of the long range") {
    import spark.implicits._
    // true gap ~2^64: a wrapped subtraction would compute a tiny "gap"
    // and keep this astronomically out-of-tolerance match
    val r = Seq(("A", Long.MinValue + 5L, 1.0)).toDF("sym", "qts", "px")
    val l = Seq(("A", Long.MaxValue - 5L, 1L)).toDF("sym", "tts", "t_id")
    val out = AsofJoin.within(
        AsofJoin.backward(l, r, Seq("sym"), "tts", "qts"), "tts", 100L)
      .collect() match { case Array(one) => one }
    assert(out.isNullAt(out.fieldIndex("asof_px")),
      s"wrapped-gap match must be nulled: $out")
    // and a genuine in-tolerance match at the extreme still survives
    val near = AsofJoin.within(
        AsofJoin.backward(
          Seq(("A", Long.MaxValue, 1L)).toDF("sym", "tts", "t_id"),
          Seq(("A", Long.MaxValue - 3L, 2.0)).toDF("sym", "qts", "px"),
          Seq("sym"), "tts", "qts"), "tts", 100L)
      .collect() match { case Array(one) => one }
    assert(near.getAs[Double]("asof_px") == 2.0, s"in-tolerance edge match lost: $near")
  }

  test("AsofJoin.within nulls matches beyond the tolerance, keeping the rest") {
    import spark.implicits._
    val quotes = Seq(("A", 10L, 1.0), ("A", 90L, 2.0)).toDF("sym", "qts", "px")
    val trades = Seq(("A", 12L, 1L), ("A", 200L, 2L)).toDF("sym", "tts", "t_id")
    val got = AsofJoin.within(
        AsofJoin.backward(trades, quotes, Seq("sym"), "tts", "qts"), "tts", 50L)
      .select("t_id", "asof_ts", "asof_px")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, Some(10L), Some(1.0)),   // gap 2 <= 50: kept
      (2L, None, None)),            // nearest is 110 back: nulled whole payload
      s"tolerance result: $got")
  }

  test("BandJoin.absBand is exact across negative timestamps (floor-div signs)") {
    import spark.implicits._
    // pairs straddling zero and bucket boundaries: truncating division
    // would misbucket negatives and drop in-band pairs
    val l = Seq((1L, -25L, 1L), (1L, -10L, 2L), (1L, 3L, 3L), (1L, 19L, 4L))
      .toDF("k", "ts", "a_id")
    val r = Seq((1L, -30L, 11L), (1L, -1L, 12L), (1L, 9L, 13L))
      .toDF("k", "ts", "b_id")
    val got = pipeline.BandJoin.absBand(l, r, Seq("k"), "ts", "ts", 10L)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = (for {
      (_, lt, a) <- Seq((1L, -25L, 1L), (1L, -10L, 2L), (1L, 3L, 3L), (1L, 19L, 4L))
      (_, rt, b) <- Seq((1L, -30L, 11L), (1L, -1L, 12L), (1L, 9L, 13L))
      if math.abs(lt - rt) <= 10
    } yield (a, b)).toSet
    assert(got == naive, s"got $got want $naive")
  }

  test("BandJoin.absBand is exact for ts values adjacent to Long.MinValue") {
    import spark.implicits._
    val m = Long.MinValue
    // m+1 and m+2 straddle the lowest representable multiple of 10: the
    // old (x - pmod(x, band)) bucket math wrapped for m..m+1 but not for
    // m+2.., splitting this in-band pair across distant buckets and
    // silently dropping it
    val l = Seq((1L, m + 1L, 1L), (1L, m + 11L, 2L)).toDF("k", "ts", "a_id")
    val r = Seq((1L, m + 2L, 11L), (1L, m + 30L, 12L)).toDF("k", "ts", "b_id")
    val got = pipeline.BandJoin.absBand(l, r, Seq("k"), "ts", "ts", 10L)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // |m+1-(m+2)|=1 ✓  |m+11-(m+2)|=9 ✓  |m+11-(m+30)|=19 ✗  |m+1-(m+30)|=29 ✗
    assert(got == Set((1L, 11L), (2L, 11L)), s"Long.MinValue-edge pairs: $got")
  }

  test("BandJoin.absBand handles odd column names and r_ prefix collisions") {
    import spark.implicits._
    // ts column with a space (would break naive string-SQL splicing) and
    // a left column already named like the default rename target
    val l = Seq((1L, 10L, 77L)).toDF("k", "my ts", "r_my ts")
    val r = Seq((1L, 12L, 5L)).toDF("k", "my ts", "payload")
    val out = pipeline.BandJoin.absBand(l, r, Seq("k"), "my ts", "my ts", 5L)
    assert(out.columns.length == out.columns.distinct.length,
      s"duplicate output columns: ${out.columns.mkString(",")}")
    val row = out.collect() match { case Array(one) => one }
    assert(row.getAs[Long]("my ts") == 10L && row.getAs[Long]("r_my ts") == 77L &&
      row.getAs[Long]("_r_my ts") == 12L && row.getAs[Long]("payload") == 5L,
      s"prefix must grow past the colliding left column: ${row}")
  }

  test("BandJoin.absBand matches the naive theta join and avoids nested loops") {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
    val band = 3600L * 1000000000L // 1 h in ns

    val banded = BandJoin.absBand(
      e.select(col("user_id"), col("ts"), col("event_id").as("a_id")),
      e.select(col("user_id"), col("ts"), col("event_id").as("b_id")),
      Seq("user_id"), "ts", "ts", band)
      .filter(col("a_id") < col("b_id"))
    val gotPairs = banded.select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val naive = e.select(col("user_id"), col("ts").as("ta"), col("event_id").as("a_id"))
      .join(e.select(col("user_id"), col("ts").as("tb"), col("event_id").as("b_id")),
        Seq("user_id"))
      .filter(col("a_id") < col("b_id") && abs(col("ta") - col("tb")) <= band)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(gotPairs == naive, s"band join must equal the theta join " +
      s"(got ${gotPairs.size}, want ${naive.size})")
    assert(gotPairs.nonEmpty, "fixture should produce in-band pairs")

    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"band join must plan as an equi-join: ${plan.take(400)}")
  }
}
