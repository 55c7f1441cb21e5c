package graft

import org.apache.spark.sql.functions._
import graft.operators.ComposedQueries

/** Semantic pins for the §2.12 composed-analytics pack beyond the generic
  * smoke run (the oracle compare is the bit-exactness gate; these assert
  * the shapes a refactor could silently break).
  */
class ComposedQueriesSpec extends SparkSpec {

  test("complex_top_revenue returns at most 10 rows in descending revenue order") {
    val rows = ComposedQueries.queries("complex_top_revenue")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getAs[Long]("revenue_c"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "not sorted desc")
  }

  test("complex_regional_revenue covers only ASIA nations and sums exactly") {
    val df = ComposedQueries.queries("complex_regional_revenue")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // every output nation must belong to the ASIA region
    val asia = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("n_name")).forall(asia.contains))
  }

  test("complex_nation_volume pairs two distinct nations over 1995-96 only") {
    val rows = ComposedQueries.queries("complex_nation_volume")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sn, cn) = (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))
      assert(Set("NATION_13", "NATION_19").contains(sn) && sn != cn)
      val y = r.getAs[Long]("l_year")
      assert(y == 1995L || y == 1996L)
      assert(r.getAs[Long]("revenue_c") > 0 && r.getAs[Long]("n_lines") > 0)
    }
  }

  test("reshape_unpivot expands each source row into exactly 4 metric rows") {
    val n = Tables.lineitem(spark, sf)
      .filter(pmod(col("l_orderkey"), lit(20)) === 3).count()
    val df = ComposedQueries.queries("reshape_unpivot")(spark, sf)
    assert(df.count() == n * 4)
    assert(df.select("metric").distinct().count() == 4)
  }

  test("agg_bit matches a driver-side fold of each group's keys") {
    val rows = ComposedQueries.queries("agg_bit")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute every aggregate independently (sf0.001 fits in memory):
    // pins the actual bit semantics, not just an AND⊆OR tautology
    val expected = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_orderkey", "l_linenumber").collect()
      .groupBy(_.getString(0)).map { case (flag, rs) =>
        val oks = rs.map(_.getLong(1))
        val lns = rs.map(_.getInt(2))
        flag -> (oks.reduce(_ & _), oks.reduce(_ | _), oks.reduce(_ ^ _),
          lns.reduce(_ & _), lns.reduce(_ | _), lns.reduce(_ ^ _))
      }
    rows.foreach { r =>
      val (andOk, orOk, xorOk, andLn, orLn, xorLn) = expected(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("and_ok") == andOk && r.getAs[Long]("or_ok") == orOk &&
        r.getAs[Long]("xor_ok") == xorOk,
        s"orderkey bit aggregates diverge for ${r.getAs[String]("l_returnflag")}")
      assert(r.getAs[Int]("and_ln") == andLn && r.getAs[Int]("or_ln") == orLn &&
        r.getAs[Int]("xor_ln") == xorLn,
        s"linenumber bit aggregates diverge for ${r.getAs[String]("l_returnflag")}")
    }
  }

  private def plan(name: String): String =
    finalizedPlan(ComposedQueries.queries(name)(spark, sf))

  test("complex_top_revenue plans top-10 as TakeOrderedAndProject with a broadcast dim") {
    val p = plan("complex_top_revenue")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must never be a global sort: ${p.take(600)}")
    assert(p.contains("BroadcastHashJoin"),
      s"filtered customer dim must broadcast: ${p.take(600)}")
    // both date filters must reach their parquet scans
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") && l.contains("o_orderdate")))
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") && l.contains("l_shipdate")))
  }

  test("complex_big_orders: every row clears the quantity floor, sorted desc") {
    val rows = ComposedQueries.queries("complex_big_orders")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val qs = rows.map(_.getAs[Long]("order_qty_c"))
    assert(qs.forall(_ > 20000L), "HAVING floor must hold")
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b }, "not sorted desc")
  }

  test("complex_big_orders shares the orderkey partitioning: ≤2 hash Exchanges, broadcast dim, top-k") {
    val p = finalPlanSection(plan("complex_big_orders"))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    // lineitem agg (1) + orders side of the semijoin-shaped join (1);
    // the aggregate's output partitioning serves the join directly
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2,
      s"per-order agg and orderkey join must share partitioning, got $shuffles")
  }

  test("complex_nation_volume broadcasts both nation-filtered dims; one fact-fact shuffle") {
    val p = finalPlanSection(plan("complex_nation_volume"))
    // supplier⋈nation, customer⋈nation, then each rides a fact broadcast:
    // ≥4 broadcast joins, and the nation pair never becomes a shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(900))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the nation pair must stay an equi-hash star: ${p.take(600)}")
    // lineitem⋈orders (≤2 Exchanges) + final agg (1); ORDER BY is range
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 3,
      s"only the orderkey join and final agg may shuffle, got $shuffles")
    // the ship-date window must reach the lineitem scan
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") && l.contains("l_shipdate")))
  }

  test("complex_regional_revenue broadcasts every dimension (one fact-fact shuffle at most)") {
    // count in the EXECUTED section only — AQE's toString repeats the
    // pre-adaptive plan under "== Initial Plan ==", where stale
    // broadcasts would mask a demotion to SortMergeJoin
    val p = finalPlanSection(plan("complex_regional_revenue"))
    // cust, supp, nation⋈region, asiaNations: ≥4 broadcast joins; the only
    // join allowed to shuffle is lineitem⋈orders
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(900))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"star join must stay equi-hash: ${p.take(600)}")
    // the named invariant: hash shuffles only for the one fact-fact join
    // (≤2 Exchanges, one per side) and the final aggregation (1); the
    // ORDER BY is rangepartitioning. Any broadcast demoted to a shuffle
    // join pushes the count past 3.
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 3,
      s"star join must shuffle only lineitem⋈orders + final agg, got $shuffles hash Exchanges")
  }

  test("reshape_unpivot plans an Expand with no shuffle before the final sort") {
    val p = plan("reshape_unpivot")
    assert(p.contains("Expand"), s"unpivot must lower to Expand: ${p.take(600)}")
    val finalSection = finalPlanSection(p)
    assert(!finalSection.contains("Exchange hashpartitioning"),
      s"melt needs no hash shuffle: ${finalSection.take(600)}")
  }

  test("evt_retention aggregates partially and shuffles at most 3 times") {
    val p = plan("evt_retention")
    assert(p.contains("partial_"), "map-side partial aggregation expected")
    val finalSection = finalPlanSection(p)
    val n = "Exchange hashpartitioning".r.findAllIn(finalSection).size
    assert(n <= 3, s"distinct + window-min + countDistinct needs ≤3 hash shuffles, got $n")
  }

  test("complex_returned_revenue aggregates before the customer join, top-20") {
    val p = finalPlanSection(plan("complex_returned_revenue"))
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    // the revenue aggregate must group on o_custkey BEFORE customer's wide
    // columns enter the stream — c_name in a HashAggregate would mean the
    // dimension rode through the aggregation
    val aggLines = p.linesIterator.filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.exists(_.contains("o_custkey")), s"agg on o_custkey expected: $aggLines")
    assert(!aggLines.exists(_.contains("c_name")),
      s"customer columns must join after the aggregate: $aggLines")
    // returnflag + quarter filters reach the scans
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") && l.contains("l_returnflag")))
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") && l.contains("o_orderdate")))
  }

  test("complex_returned_revenue rows are returned-only revenue, sorted desc") {
    val rows = ComposedQueries.queries("complex_returned_revenue")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Long]("revenue_c"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    assert(revs.forall(_ > 0))
  }

  test("complex_promo_share: promo ≤ total and basis points recompute exactly") {
    val r = ComposedQueries.queries("complex_promo_share")(spark, sf).collect().head
    val (promo, total, bp) =
      (r.getAs[Long]("promo_rev_c"), r.getAs[Long]("total_rev_c"), r.getAs[Long]("promo_bp"))
    assert(promo >= 0 && promo <= total && total > 0)
    assert(bp == math.round(promo * 10000.0 / total), s"bp $bp drifted")
  }

  test("complex_priority_buckets: high+low equals the joined line count") {
    val rows = ComposedQueries.queries("complex_priority_buckets")(spark, sf).collect()
    assert(rows.nonEmpty)
    val joined = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= to_timestamp(lit("1998-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1999-01-01")))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(rows.map(r => r.getAs[Long]("high_lines") + r.getAs[Long]("low_lines")).sum == joined)
  }

  test("complex_bracket_filter pushes the part-side predicate before the join") {
    val p = finalPlanSection(plan("complex_bracket_filter"))
    // the brand×size OR must filter part's scan, and the quantity envelope
    // must filter lineitem's scan — the hand-split that Catalyst cannot do
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") && l.contains("p_brand")),
      "part-side brand/size predicate must reach the part scan")
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") && l.contains("l_quantity")),
      "quantity envelope must reach the lineitem scan")
    val rows = ComposedQueries.queries("complex_bracket_filter")(spark, sf).collect()
    val brands = rows.map(_.getAs[String]("p_brand")).toSet
    assert(brands.subsetOf(Set("Brand#12", "Brand#23", "Brand#24")))
  }

  test("complex_market_share: share in [0,10000] bp, dims broadcast, one fact-fact shuffle pair") {
    val rows = ComposedQueries.queries("complex_market_share")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nat, tot, bp) = (r.getAs[Long]("nation_rev_c"),
        r.getAs[Long]("total_rev_c"), r.getAs[Long]("share_bp"))
      assert(nat >= 0 && nat <= tot && bp >= 0 && bp <= 10000)
      assert(bp == math.round(nat * 10000.0 / tot))
      val y = r.getAs[Long]("o_year")
      assert(y == 1996L || y == 1997L)
    }
    val p = finalPlanSection(plan("complex_market_share"))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"customer and supplier dims must broadcast: ${p.take(900)}")
  }

  test("evt_retention day-0 cohort sizes sum to the distinct user count") {
    val df = ComposedQueries.queries("evt_retention")(spark, sf)
    val day0 = df.filter(col("day_offset") === 0)
      .agg(sum("users")).collect().head.getLong(0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    // every user is active on their own cohort day by construction
    assert(day0 == users, s"day-0 sum $day0 != $users distinct users")
    // offsets are never negative and users never exceed the universe
    assert(df.filter(col("day_offset") < 0).isEmpty)
    assert(df.agg(max("users")).collect().head.getLong(0) <= users)
  }
}
