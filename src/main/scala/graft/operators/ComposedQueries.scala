package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** SURVEY.md §2.12 — composed analytics: multi-table star-schema queries,
  * wide-to-long reshaping, bitwise aggregates, and cohort retention. These
  * exercise the engine the way a real workload does — several joins, an
  * aggregation, and a top-k in ONE plan — rather than one operator at a
  * time, so Catalyst's join reordering / broadcast selection / partial
  * aggregation all have to fire together.
  *
  * Determinism (§7.5): every money sum is per-row integer cents BEFORE the
  * aggregate (`CAST(round(x*100) AS BIGINT)` then `sum`) — integer sums are
  * associative, so the result is identical under any partitioning or
  * aggregation order, unlike summing doubles. Timestamps are emitted as
  * epoch seconds.
  */
object ComposedQueries extends QueryPack {

  /** Per-row exact cents: both engines round the SAME double, then all
    * aggregation is integer math.
    */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** TPC-H-Q3-shaped: unshipped-revenue top-10. customer(segment) ⋈
    * orders(date window) ⋈ lineitem(shipped after), revenue per order,
    * top 10. Scale shape: lineitem⋈orders shuffles on the orderkey;
    * the filtered customer dimension broadcasts (no third shuffle); the
    * top-10 is TakeOrderedAndProject, never a global sort.
    */
  private def complexTopRevenue(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1999-01-01")))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1999-01-01")))
      .select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("odate_s"), col("o_orderpriority"))
      .agg(sum("rev_c").as("revenue_c"), count(lit(1)).as("n_lines"))
      .orderBy(desc("revenue_c"), asc("o_orderkey"))
      .limit(10)
  }

  /** TPC-H-Q5-shaped: per-nation revenue where supplier and customer share
    * the nation, one region, a date window — a 6-table star join. Scale
    * shape: the two fact tables join on orderkey (one co-partitioned
    * shuffle); customer, supplier, nation, region are broadcast dimensions
    * (supplier rides along lineitem's suppkey, then the nation-equality
    * filter cuts the stream before the aggregate).
    */
  /** The Q5 star core, parameterized over its six inputs so the oracle
    * key and ScaleBench's 10× run benchmark the SAME plan (a bench copy
    * could silently drift from the verified query). Unordered — callers
    * add their own total order.
    */
  def regionalRevenueCore(lineitem: DataFrame, orders: DataFrame,
                          customer: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame): DataFrame = {
    val asiaNations = broadcast(nation
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name")))
    val cust = broadcast(customer.select(col("c_custkey"), col("c_nationkey")))
    val supp = broadcast(supplier.select(col("s_suppkey"), col("s_nationkey")))
    val ord = orders
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("2000-01-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum("rev_c").as("revenue_c"), count(lit(1)).as("n_lines"))
  }

  private def complexRegionalRevenue(s: SparkSession, dir: String): DataFrame =
    regionalRevenueCore(
      Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
      Tables.supplier(s, dir), Tables.nation(s, dir), Tables.region(s, dir))
      .orderBy(desc("revenue_c"), asc("n_name"))

  /** Wide→long reshape (melt): the four lineitem measures become
    * (metric, value) rows via Spark's native `unpivot` (an Expand node —
    * no shuffle, no UDF; DuckDB replays it as UNION ALL). Values are
    * rounded per row BEFORE the reshape so both engines emit identical
    * doubles. Bounded to a deterministic 5% orderkey slice to keep the
    * 4× row expansion proportionate at every scale factor.
    */
  private def reshapeUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(pmod(col("l_orderkey"), lit(20)) === 3)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 2).as("l_quantity"),
        round(col("l_extendedprice"), 2).as("l_extendedprice"),
        round(col("l_discount"), 2).as("l_discount"),
        round(col("l_tax"), 2).as("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  /** Bitwise aggregates per group — bit_and/bit_or/bit_xor over the
    * orderkey and linenumber domains (all-integer, exact; the xor is a
    * partition-order-independent fold, the classic distributed checksum).
    */
  private def aggBit(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("bit_and(l_orderkey)").as("and_ok"),
        expr("bit_or(l_orderkey)").as("or_ok"),
        expr("bit_xor(l_orderkey)").as("xor_ok"),
        expr("bit_and(l_linenumber)").as("and_ln"),
        expr("bit_or(l_linenumber)").as("or_ln"),
        expr("bit_xor(l_linenumber)").as("xor_ln"))
      .orderBy(col("l_returnflag"))

  /** Cohort retention over the events stream: each user's cohort is their
    * first active day; count distinct users active at each (cohort day,
    * day offset). The classic training-corpus freshness/engagement query.
    * Day bucketing is exact integer division on the ns epoch. One shuffle
    * for the per-user window minimum, one for the distinct-count — the
    * distinct is pre-shrunk to (user, day) pairs before counting.
    */
  private def evtRetention(s: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400000000000L
    val ud = Tables.events(s, dir)
      .select(col("user_id"), expr(s"ts DIV $dayNs").as("day"))
      .distinct()
    ud.withColumn("cohort_day", min("day").over(Window.partitionBy("user_id")))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** TPC-H-Q7-shaped: shipping volume between two nations by year —
    * supplier-nation × customer-nation × ship-year revenue, nations
    * restricted to an unequal pair. Scale shape: the nation filter rides
    * the two broadcast dimension joins (supplier and customer shrink to
    * ~2/25 of their rows BEFORE touching a fact table), lineitem joins
    * orders on the orderkey — the only fact-fact shuffle — and the final
    * aggregate has ≤ 2·years groups.
    */
  private def complexNationVolume(s: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(s, dir)
      .filter(col("n_name").isin("NATION_13", "NATION_19"))
    val supp = broadcast(Tables.supplier(s, dir)
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation")))
    val cust = broadcast(Tables.customer(s, dir)
      .join(broadcast(nat.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_nation")))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum("rev_c").as("revenue_c"), count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H-Q18-shaped: customers who placed very large orders — the
    * grouped-HAVING semijoin composition. lineitem aggregates per order,
    * the qualifying order keys semijoin-filter orders (exact integer
    * quantity-cents compare), then the customer dimension broadcasts and
    * the top-100 is TakeOrderedAndProject. Scale shape: the per-order
    * aggregate and the semijoin share the orderkey hash partitioning, so
    * AQE plans ONE orderkey Exchange chain — never a second full
    * lineitem pass; qualifying keys are rare (heavy-hitter selection).
    */
  private def complexBigOrders(s: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), cents(col("l_quantity")).as("qty_c"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("qty_c")).as("order_qty_c"), count(lit(1)).as("n_lines"))
      .filter(col("order_qty_c") > 200L * 100)
    val cust = broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_name")))
    Tables.orders(s, dir)
      // yyyymmdd integer key instead of epoch seconds: year/month/day
      // are ANSI-portable, so this oracle runs unchanged via spark.sql
      .select(col("o_orderkey"), col("o_custkey"),
        (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100 +
          dayofmonth(col("o_orderdate"))).cast("long").as("odate_key"),
        cents(col("o_totalprice")).as("price_c"))
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("odate_key"), col("price_c"), col("order_qty_c"), col("n_lines"))
      .orderBy(desc("order_qty_c"), asc("o_orderkey"))
      .limit(100)
  }

  /** TPC-H-Q10-shaped: customers who returned the most revenue in one
    * quarter. Scale shape: lineitem is pre-filtered to returnflag='R' and
    * pre-aggregated to (custkey, revenue) BEFORE touching the customer
    * dimension — the wide name/acctbal columns never ride through the
    * fact-fact shuffle or the aggregate. The quarter filter prunes orders
    * at the scan; the nation lookup broadcasts; the top-20 is
    * TakeOrderedAndProject.
    */
  private def complexReturnedRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    val ord = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1996-04-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    val perCust = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum("rev_c").as("revenue_c"), count(lit(1)).as("n_lines"))
    val nat = broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name")))
    perCust
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_c"), col("n_name"),
        col("revenue_c"), col("n_lines"))
      .orderBy(desc("revenue_c"), asc("c_custkey"))
      .limit(20)
  }

  /** TPC-H-Q14-shaped: promotional revenue share for one ship-month — the
    * conditional-sum-ratio query. Scale shape: the month filter prunes
    * lineitem at the scan (~1/80 of rows); part is projected to
    * (partkey, is_promo) — 9 bytes a row — before the partkey shuffle
    * join; the final ratio is one row from two integer sums. The share is
    * emitted in basis points over integer cents so both engines round the
    * same double exactly once.
    */
  private def complexPromoShare(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-09-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-10-01")))
      .select(col("l_partkey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    val prt = Tables.part(s, dir)
      .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo"))
    li.join(prt, col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("is_promo"), col("rev_c")).otherwise(0L)).as("promo_rev_c"),
        sum(col("rev_c")).as("total_rev_c"))
      .select(col("promo_rev_c"), col("total_rev_c"),
        round(col("promo_rev_c") * 10000.0 / col("total_rev_c"))
          .cast("long").as("promo_bp"))
  }

  /** TPC-H-Q12-shaped: line counts by status, split into high/low order
    * priority — conditional aggregation over a fact-fact join. Scale
    * shape: lineitem is pruned to one ship-year at the scan and projected
    * to the orderkey alone; orders carries only (orderkey, priority);
    * the join shuffles on the orderkey and the aggregate output is 2
    * rows, so the reduce side is all partial (map-side) aggregation.
    */
  private def complexPriorityBuckets(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1998-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1999-01-01")))
      .select(col("l_orderkey"), col("l_linestatus"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_lines"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_lines"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H-Q19-shaped: OR-of-ANDs bracket predicate across a join — the
    * classic predicate-split test. Scale shape: the part-only half of
    * each disjunct (brand × size) filters part BEFORE the join, and the
    * lineitem-only envelope (quantity ≤ the widest bracket) filters
    * lineitem at the scan, so the partkey shuffle moves ~12% of part and
    * ~60% of lineitem; the full per-bracket predicate then runs on the
    * joined stream. Catalyst cannot split an OR across tables by itself —
    * doing it by hand here is exactly what a 100 TB plan needs.
    */
  /** The Q19 core, parameterized like [[regionalRevenueCore]] so
    * ScaleBench's 10× run benchmarks the SAME plan as the oracle key.
    * Unordered — callers add their own total order.
    */
  def bracketFilterCore(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val partPred =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)) ||
      (col("p_brand") === "Brand#24" && col("p_size").between(1, 35))
    val prt = part
      .filter(partPred)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = lineitem
      .filter(col("l_quantity") >= 1.0 && col("l_quantity") <= 30.0)
      .select(col("l_partkey"), col("l_quantity"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    val bracket =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1.0, 11.0)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10.0, 20.0)) ||
      (col("p_brand") === "Brand#24" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20.0, 30.0))
    li.join(prt, col("l_partkey") === col("p_partkey"))
      .filter(bracket)
      .groupBy(col("p_brand"))
      .agg(sum("rev_c").as("revenue_c"), count(lit(1)).as("n_lines"))
  }

  private def complexBracketFilter(s: SparkSession, dir: String): DataFrame =
    bracketFilterCore(Tables.lineitem(s, dir), Tables.part(s, dir))
      .orderBy(col("p_brand"))

  /** TPC-H-Q8-shaped: one supplier nation's share of a region's revenue
    * per order-year — grouped conditional-sum ratio over a 7-table star.
    * Scale shape: part is filtered to one type before its partkey join;
    * customer is pre-shrunk to the EUROPE region through two broadcast
    * dimension joins; supplier broadcasts as (suppkey, nation); the only
    * fact-fact shuffle is lineitem⋈orders on the orderkey. Share is basis
    * points over integer cents, 2 output rows.
    */
  /** The Q8 core, parameterized like [[regionalRevenueCore]] so
    * ScaleBench's 10× run benchmarks the SAME plan as the oracle key.
    * Unordered — callers add their own total order.
    */
  def marketShareCore(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame,
                      part: DataFrame): DataFrame = {
    val europeNations = broadcast(nation
      .join(broadcast(region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")))
    val cust = broadcast(customer
      .join(europeNations, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey")))
    val supp = broadcast(supplier
      .join(broadcast(nation
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation")))
    val prt = part
      .filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val ord = orders
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val li = lineitem
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    li.join(prt, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_13", col("rev_c"))
          .otherwise(0L)).as("nation_rev_c"),
        sum(col("rev_c")).as("total_rev_c"))
      .select(col("o_year"), col("nation_rev_c"), col("total_rev_c"),
        round(col("nation_rev_c") * 10000.0 / col("total_rev_c"))
          .cast("long").as("share_bp"))
  }

  /** TPC-H-Q4-shaped: order counts per priority where at least one line
    * shipped more than 90 days after the order date — EXISTS with a
    * correlated inequality against an OUTER column (richer than the
    * plain equi-EXISTS of join_semi). Scale shape: orders is pruned to
    * one year at the scan; lineitem is projected to (orderkey, shipdate)
    * before the left-semi join's orderkey shuffle; the aggregate output
    * is 5 rows, all partial map-side.
    */
  /** The Q4 core, parameterized like [[regionalRevenueCore]] so
    * ScaleBench's 10× run benchmarks the SAME plan as the oracle key.
    * Unordered — callers add their own total order.
    */
  def orderPriorityCore(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val ord = orders
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = lineitem.select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  private def complexOrderPriority(s: SparkSession, dir: String): DataFrame =
    orderPriorityCore(Tables.lineitem(s, dir), Tables.orders(s, dir))
      .orderBy(col("o_orderpriority"))

  /** TPC-H-Q13-shaped: the distribution of per-customer order counts
    * (how many customers placed k orders), orders filtered by priority,
    * customers with none kept at k = 0 via the outer join. Scale shape:
    * orders pre-aggregates to (custkey, count) BEFORE touching customer —
    * the left join then moves one small row per customer instead of one
    * per order, and the second aggregate's domain is tiny (distinct
    * counts), so it is all map-side partial.
    */
  /** The Q13 core, parameterized like [[regionalRevenueCore]] so
    * ScaleBench's 10× run benchmarks the SAME plan as the oracle key.
    * Unordered — callers add their own total order.
    */
  def custDistributionCore(orders: DataFrame, customer: DataFrame): DataFrame = {
    val oc = orders
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("o_count"))
    customer.select(col("c_custkey"))
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("o_count"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  private def complexCustDistribution(s: SparkSession, dir: String): DataFrame =
    custDistributionCore(Tables.orders(s, dir), Tables.customer(s, dir))
      .orderBy(desc("custdist"), desc("c_count"))

  /** TPC-H-Q17-shaped: revenue from small-quantity lines — lines whose
    * quantity is below half their part's average quantity, one brand.
    * The oracle states it as TWO correlated scalar subqueries (count and
    * sum per part); this plan is the decorrelated form a 100 TB run
    * needs: the per-part totals pre-aggregate ONCE, restricted to the
    * brand's partkeys via a broadcast semi-filter, and the re-join
    * shares the aggregate's partkey hash partitioning. The "below half
    * the average" test is exact integer math — qty·2·n < Σqty in cents —
    * so membership can never drift between engines the way a double
    * average comparison could.
    */
  private def complexSmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val bp = broadcast(Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey")))
    val li = Tables.lineitem(s, dir)
      .join(bp, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), cents(col("l_quantity")).as("qty_c"),
        cents(col("l_extendedprice")).as("price_c"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"), sum(col("qty_c")).as("sum_qty_c"))
      .withColumnRenamed("l_partkey", "pp_partkey")
    li.join(perPart, col("l_partkey") === col("pp_partkey"))
      .filter(col("qty_c") * 2 * col("n") < col("sum_qty_c"))
      .agg(sum(col("price_c")).as("rev_c"), count(lit(1)).as("n_lines"))
  }

  /** TPC-H-Q21-shaped: suppliers who alone held up a multi-supplier
    * order — a late line (90-day rule as in Q4) on an order with ≥ 2
    * suppliers where NO other supplier was late. The oracle states it as
    * EXISTS + NOT EXISTS; this plan computes the per-order supplier
    * profile (distinct suppliers, distinct LATE suppliers) as WINDOWS
    * over the collapsed per-(order, supplier) table, then keeps late
    * lines on orders with (n_supp ≥ 2, n_late_supp = 1) — the
    * only-late-supplier condition, since the line's own supplier is late
    * by construction. Scale shape: ONE orderkey exchange feeds the
    * collapse aggregate AND both profile windows; the supplier dimension
    * broadcasts; top-20 is TakeOrderedAndProject.
    */
  /** The Q21 core, parameterized like [[regionalRevenueCore]] so
    * ScaleBench's 10× run benchmarks the SAME plan as the oracle key.
    * Unordered/unlimited — callers add their own total order + top-k.
    */
  def waitingSuppliersCore(lineitem: DataFrame, orders: DataFrame,
                           supplier: DataFrame): DataFrame = {
    val ord = orders
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    // ONE pass over the joined fact: collapse straight to per-(order,
    // supplier) late-line counts. Everything after — the order profile,
    // the only-late-supplier filter, numwait itself (= Σ late lines of
    // the single late supplier on qualifying orders) — rides the SAME
    // hash(o_orderkey) exchange as WINDOWS: the explicit repartition
    // satisfies both the collapse aggregate's clustered distribution
    // (its grouping keys are a superset of the partitioning) and the
    // profile windows' partitionBy, so neither plans its own shuffle.
    // This replaces the earlier localCheckpoint + profile re-aggregate +
    // qualifying-order rejoin: the checkpoint materialization and one
    // exchange gone for the same answer, and the fact subtree is
    // referenced ONCE so no CSE hazard remains. Map-side combine before
    // the repartition is deliberately forgone — orders carry ~1 line per
    // (order, supplier), so pre-collapse combining would shrink the
    // shuffle by ~nothing while costing the shared partitioning.
    // Probed r16 (MetricsProbe showed the near-identity collapse costs
    // ~490 ms aggTime): replacing the groupBy with a row_number +
    // group-sum window chain over the per-LINE rows measured WORSE —
    // 512 → 607 ms wall, 347 → 432 task-ms (JobProbe iters=6,
    // back-to-back) — the third window pass and the 3-key sort cost
    // more than the two hash aggregates they remove. Kept the collapse.
    val perOrderSupp = lineitem
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("l_suppkey"),
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
          1L).otherwise(0L).as("late"))
      .repartition(col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("l_suppkey"))
      .agg(sum(col("late")).as("n_late_lines"))
    val byOrder = Window.partitionBy(col("o_orderkey"))
    val supp = broadcast(supplier.select(col("s_suppkey"), col("s_name")))
    perOrderSupp
      // ONE select, not two withColumns: both profile expressions share
      // the byOrder spec, and stating them in a single projection lets
      // ExtractWindowExpressions plan ONE Window node (the withColumn
      // form interposed a Project that defeated CollapseWindow — the
      // r15 plan ran two window passes over the same sort for no
      // reason; r16, ~280 ms of the key's 719 ms window-stage time).
      .select(col("o_orderkey"), col("l_suppkey"), col("n_late_lines"),
        count(lit(1)).over(byOrder).as("n_supp"),
        sum(when(col("n_late_lines") > 0, 1L).otherwise(0L)).over(byOrder)
          .as("n_late_supp"))
      .filter(col("n_late_lines") > 0 &&
        col("n_supp") >= 2 && col("n_late_supp") === 1)
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("n_late_lines")).as("numwait"))
  }

  private def complexWaitingSuppliers(s: SparkSession, dir: String): DataFrame =
    waitingSuppliersCore(Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.supplier(s, dir))
      .orderBy(desc("numwait"), asc("s_name"))
      .limit(20)

  /** TPC-H-Q22-shaped: per-nation count and balance of rich, inactive
    * customers — balance above the average positive balance of a nation
    * slice, and no urgent order ever (every customer here has SOME
    * order, so the anti-join condition is priority-scoped). The
    * above-average test is exact integers (bal·n > Σbal in cents); the
    * global average is ONE row broadcast into the scan-level filter.
    * Scale shape: the anti join shuffles on the custkey; everything
    * before it is a scan-level filter plus a 1-row cross join.
    */
  private def complexSalesOpportunity(s: SparkSession, dir: String): DataFrame = {
    val slice = Tables.customer(s, dir)
      .filter(col("c_nationkey").isin(1, 3, 5, 7, 9))
      .select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("bal_c"))
    val tot = slice.filter(col("bal_c") > 0)
      .agg(count(lit(1)).as("n"), sum(col("bal_c")).as("sum_c"))
    val urgent = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    slice.crossJoin(broadcast(tot))
      .filter(col("bal_c") * col("n") > col("sum_c"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"), sum(col("bal_c")).as("bal_c_sum"))
      .orderBy(col("c_nationkey"))
  }

  /** TPC-H-Q9-shaped (adapted — no partsupp table, so unit cost is the
    * part's retail price): product-line profit per (supplier nation,
    * order year) for parts with "red" in the name. Profit is exact
    * integers end-to-end: revenue cents − cost cents × integral
    * quantity. Scale shape: the name-filtered part dim (≈13%)
    * broadcasts and shrinks the fact BEFORE the orderkey shuffle —
    * lineitem⋈orders is the only fact-fact exchange; supplier and
    * nation broadcast; ≤ nations × years groups, all map-side partial.
    */
  def productProfitCore(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
                        supplier: DataFrame, nation: DataFrame): DataFrame = {
    val redParts = part.filter(col("p_name").contains("red"))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("unit_cost_c"))
    val li = lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"),
      round(col("l_quantity")).cast("long").as("qty"))
    val ord = orders.select(col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("o_year"))
    li.join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("rev_c") - col("unit_cost_c") * col("qty")).as("profit_c"))
  }

  private def complexProductProfit(s: SparkSession, dir: String): DataFrame =
    productProfitCore(Tables.lineitem(s, dir), Tables.orders(s, dir),
      Tables.part(s, dir), Tables.supplier(s, dir), Tables.nation(s, dir))
      .orderBy(col("n_name"), col("o_year"))

  /** TPC-H-Q15-shaped: the supplier(s) with the maximum revenue over one
    * quarter — the revenue-equals-scalar-max pattern. The per-supplier
    * aggregate is tiny (one row per supplier, map-side partial); the max
    * is ONE row broadcast back as a filter; the supplier dim broadcasts
    * for the name. No window, no global sort — ties all surface, exact
    * integer cents make "equal to max" deterministic.
    */
  def topSupplierCore(lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("rev_c"))
    val mx = rev.agg(max(col("rev_c")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_c") === col("mx"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_c"))
  }

  private def complexTopSupplier(s: SparkSession, dir: String): DataFrame =
    topSupplierCore(Tables.lineitem(s, dir), Tables.supplier(s, dir))
      .orderBy(col("s_suppkey"))

  /** TPC-H-Q16-shaped (adapted — the part-supplier relation is the
    * DISTINCT (l_partkey, l_suppkey) pairs; the excluded-supplier set is
    * the negative-balance suppliers): how many distinct suppliers can
    * deliver each surviving (brand, type, size) combination, excluded
    * suppliers anti-joined out. Scale shape (r8 rework, 3 wide edges →
    * 2): the broadcast part filter and the ~6-row broadcast anti join
    * both run AT THE SCAN — scan-side, exchange-free — so the only
    * shuffled rows are part-filtered; the old explicit (partkey,
    * suppkey) distinct was a full-fact exchange that
    * `countDistinct(suppkey)` makes REDUNDANT (a supplier counts once
    * per (brand, type, size) group whether deduped per part or not —
    * the distinct aggregate's own two-phase expand dedups map-side).
    */
  def supplierVarietyCore(lineitem: DataFrame, part: DataFrame,
                          supplier: DataFrame): DataFrame = {
    val excluded = supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val pf = part.filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 14, 21))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  private def complexSupplierVariety(s: SparkSession, dir: String): DataFrame =
    supplierVarietyCore(Tables.lineitem(s, dir), Tables.part(s, dir),
      Tables.supplier(s, dir))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))

  /** Type-2 slowly-changing-dimension build from an event stream — the
    * warehouse ETL shape: each signup carries a value tier (exact
    * integer cents DIV 5000); consecutive equal tiers collapse
    * (change detection via lag), and each surviving change opens a
    * validity interval closed by the NEXT change (lead), open-ended for
    * the current row. Scale shape: ONE hash Exchange on user_id feeds
    * both windows — the change filter preserves partitioning and sort
    * order, so lag, filter, and lead share a single shuffle+sort
    * (plan-audited). Per-user state never materializes anywhere except
    * the sorted partition — the same shape at 1e9 users.
    */
  def scd2Core(events: DataFrame): DataFrame = {
    val base = events.filter(col("event_type") === "signup")
      .select(col("user_id"), cents(col("value")).as("val_c"),
        col("ts").as("tns"), col("event_id"))
      .withColumn("tier", expr("val_c DIV 5000"))
    val w = Window.partitionBy("user_id").orderBy(col("tns"), col("event_id"))
    base.withColumn("prev", lag(col("tier"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("tier"))
      .withColumn("valid_to_ns", lead(col("tns"), 1).over(w))
      .select(col("user_id"), col("tier"),
        expr("tns DIV 1000000000").as("valid_from_s"),
        expr("valid_to_ns DIV 1000000000").as("valid_to_s"))
  }

  private def complexScd2(s: SparkSession, dir: String): DataFrame =
    scd2Core(Tables.events(s, dir)).orderBy(col("user_id"), col("valid_from_s"))

  private def complexMarketShare(s: SparkSession, dir: String): DataFrame =
    marketShareCore(
      Tables.lineitem(s, dir), Tables.orders(s, dir), Tables.customer(s, dir),
      Tables.supplier(s, dir), Tables.nation(s, dir), Tables.region(s, dir),
      Tables.part(s, dir))
      .orderBy(col("o_year"))

  /** TPC-H-Q6-shaped: forecast revenue — the pure scan-bound
    * filter+aggregate, the query whose whole cost is how little the scan
    * reads. Scale shape: the shipdate range pushes to the parquet scan
    * (row-group pruning on a date-sorted layout), the projection is 3
    * columns, and the answer is ONE partial-aggregated row — no shuffle
    * moves data, only the 1-row partials. Discount matches on exact
    * integer percent (the stored double rounds identically in both
    * engines); revenue = Σ cents·pct is exact integer 10⁻⁴-dollars.
    */
  def forecastRevenueCore(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_quantity") < 24)
      .select((cents(col("l_extendedprice")) *
        round(col("l_discount") * 100).cast("long")).as("rev_cp"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"))
      .filter(col("disc_pct").between(5, 7))
      .agg(sum(col("rev_cp")).as("revenue_cp"), count(lit(1)).as("n_lines"))

  private def complexForecastRevenue(s: SparkSession, dir: String): DataFrame =
    forecastRevenueCore(Tables.lineitem(s, dir))

  /** Customer-lifetime-value DECILES — rank every customer by exact-cents
    * order revenue, cut the ranking into ten ntile(10) buckets, and
    * profile each decile (count / revenue share / min / max): the
    * whale-curve query behind every LTV analysis. All outputs are exact
    * BIGINTs — no float leaves the plan.
    *
    * A global ntile is the canonical 100 TB killer: `ntile(10) OVER
    * (ORDER BY …)` is a single-partition window over every customer.
    * Instead the global rank comes from the range-bucketed decomposition
    * (the sample_shuffle/token_budget discipline, here on the DESCENDING
    * revenue key): bucket by `rev_c DIV 10⁵` — a prefix of the sort key,
    * so descending-bucket order IS global order and equal keys never
    * split — rank inside each bucket in parallel, re-base with offsets
    * from a tiny per-bucket aggregate, and replay ntile's exact fill
    * rule (first n mod 10 buckets take ⌈n/10⌉, the rest ⌊n/10⌋) in pure
    * integer arithmetic on (rank, n). The oracle states the naive
    * single-window ntile; the hash compare certifies the decomposition.
    */
  def revenueDecilesCore(orders: DataFrame): DataFrame = {
    val r = orders
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
      .withColumn("bucket", expr("rev_c DIV 100000"))
    // n_total = Σ bn rides the offsets table's OWN single-partition
    // stage (a second unbounded window over the tiny per-bucket
    // summary) — a separate `r.agg(count)` subtree would column-prune
    // into a second orders scan + its own distinct exchange +
    // broadcast, all to re-derive a number the summary already holds
    val offsets = r.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .withColumn("off",
        sum(col("bn")).over(Window.orderBy(desc("bucket"))) - col("bn"))
      .withColumn("n_total",
        sum(col("bn")).over(Window.partitionBy()))
      .select(col("bucket").as("ob"), col("off"), col("n_total"))
    val w = Window.partitionBy("bucket").orderBy(desc("rev_c"), col("o_custkey"))
    r.join(broadcast(offsets), col("bucket") === col("ob"))
      .withColumn("rank", row_number().over(w) + col("off"))
      // ntile(10): q = n DIV 10, m = n MOD 10; ranks 1..m(q+1) fill the
      // first m buckets with q+1 rows, the rest get q
      .withColumn("decile", expr(
        """CASE WHEN rank <= (n_total % 10) * (n_total DIV 10 + 1)
          |  THEN (rank - 1) DIV (n_total DIV 10 + 1) + 1
          |  ELSE n_total % 10
          |    + (rank - (n_total % 10) * (n_total DIV 10 + 1) - 1)
          |        DIV (n_total DIV 10) + 1
          |END""".stripMargin))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_cust"), sum(col("rev_c")).as("sum_rev_c"),
        min(col("rev_c")).as("min_rev_c"), max(col("rev_c")).as("max_rev_c"))
  }

  private def complexRevenueDeciles(s: SparkSession, dir: String): DataFrame =
    revenueDecilesCore(Tables.orders(s, dir)).orderBy(col("decile"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "complex_revenue_deciles"  -> (complexRevenueDeciles _),
    "complex_forecast_revenue" -> (complexForecastRevenue _),
    "complex_big_orders"       -> (complexBigOrders _),
    "complex_top_revenue"      -> (complexTopRevenue _),
    "complex_regional_revenue" -> (complexRegionalRevenue _),
    "complex_nation_volume"    -> (complexNationVolume _),
    "reshape_unpivot"          -> (reshapeUnpivot _),
    "agg_bit"                  -> (aggBit _),
    "evt_retention"            -> (evtRetention _),
    "complex_returned_revenue" -> (complexReturnedRevenue _),
    "complex_promo_share"      -> (complexPromoShare _),
    "complex_priority_buckets" -> (complexPriorityBuckets _),
    "complex_bracket_filter"   -> (complexBracketFilter _),
    "complex_market_share"     -> (complexMarketShare _),
    "complex_order_priority"   -> (complexOrderPriority _),
    "complex_cust_distribution" -> (complexCustDistribution _),
    "complex_small_qty_revenue" -> (complexSmallQtyRevenue _),
    "complex_waiting_suppliers" -> (complexWaitingSuppliers _),
    "complex_sales_opportunity" -> (complexSalesOpportunity _),
    "complex_scd2"             -> (complexScd2 _),
    "complex_product_profit"   -> (complexProductProfit _),
    "complex_top_supplier"     -> (complexTopSupplier _),
    "complex_supplier_variety" -> (complexSupplierVariety _))

  val oracle: Map[String, String] = Map(
    "complex_revenue_deciles" ->
      """WITH r AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY o_custkey),
        |t AS (
        |  SELECT o_custkey, rev_c,
        |    ntile(10) OVER (ORDER BY rev_c DESC, o_custkey) AS decile
        |  FROM r)
        |SELECT CAST(decile AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(rev_c) AS BIGINT) AS sum_rev_c,
        |  CAST(min(rev_c) AS BIGINT) AS min_rev_c,
        |  CAST(max(rev_c) AS BIGINT) AS max_rev_c
        |FROM t GROUP BY decile
        |ORDER BY decile""".stripMargin,
    "complex_big_orders" ->
      """WITH po AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS order_qty_c,
        |    count(*) AS n_lines
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) > 20000
        |)
        |SELECT c.c_custkey, c.c_name, o.o_orderkey,
        |  CAST(year(o.o_orderdate) * 10000 + month(o.o_orderdate) * 100
        |       + day(o.o_orderdate) AS BIGINT) AS odate_key,
        |  CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_c,
        |  po.order_qty_c, po.n_lines
        |FROM orders o
        |JOIN po ON o.o_orderkey = po.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY order_qty_c DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "complex_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |WHERE sn.n_name IN ('NATION_13', 'NATION_19')
        |  AND cn.n_name IN ('NATION_13', 'NATION_19')
        |  AND sn.n_name <> cn.n_name
        |  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "complex_top_revenue" ->
      """SELECT o.o_orderkey,
        |  epoch_ns(o.o_orderdate) // 1000000000 AS odate_s,
        |  o.o_orderpriority,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1999-01-01'
        |  AND l.l_shipdate >= TIMESTAMP '1999-01-01'
        |GROUP BY o.o_orderkey, odate_s, o.o_orderpriority
        |ORDER BY revenue_c DESC, o.o_orderkey
        |LIMIT 10""".stripMargin,
    "complex_regional_revenue" ->
      """SELECT n.n_name,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '2000-01-01'
        |GROUP BY n.n_name
        |ORDER BY revenue_c DESC, n.n_name""".stripMargin,
    "reshape_unpivot" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber,
        |    round(l_quantity, 2) AS l_quantity,
        |    round(l_extendedprice, 2) AS l_extendedprice,
        |    round(l_discount, 2) AS l_discount,
        |    round(l_tax, 2) AS l_tax
        |  FROM lineitem WHERE l_orderkey % 20 = 3)
        |SELECT l_orderkey, l_linenumber, metric, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src) u
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "agg_bit" ->
      """SELECT l_returnflag,
        |  bit_and(l_orderkey) AS and_ok,
        |  bit_or(l_orderkey) AS or_ok,
        |  bit_xor(l_orderkey) AS xor_ok,
        |  bit_and(l_linenumber) AS and_ln,
        |  bit_or(l_linenumber) AS or_ln,
        |  bit_xor(l_linenumber) AS xor_ln
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "evt_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |cohorted AS (
        |  SELECT user_id, day, min(day) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM ud)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  count(DISTINCT user_id) AS users
        |FROM cohorted
        |GROUP BY cohort_day, day_offset
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "complex_returned_revenue" ->
      """WITH pc AS (
        |  SELECT o.o_custkey,
        |    CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |    count(*) AS n_lines
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_returnflag = 'R'
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY o.o_custkey)
        |SELECT c.c_custkey, c.c_name,
        |  CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
        |  n.n_name, pc.revenue_c, pc.n_lines
        |FROM pc
        |JOIN customer c ON pc.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |ORDER BY revenue_c DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "complex_forecast_revenue" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cp,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24
        |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7""".stripMargin,
    "complex_promo_share" ->
      """SELECT
        |  CAST(sum(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS promo_rev_c,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_rev_c,
        |  CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
        |      THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
        |      ELSE 0 END) * 10000.0
        |    / sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))) AS BIGINT) AS promo_bp
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "complex_priority_buckets" ->
      """SELECT l.l_linestatus,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1999-01-01'
        |GROUP BY l.l_linestatus
        |ORDER BY l.l_linestatus""".stripMargin,
    "complex_bracket_filter" ->
      """SELECT p.p_brand,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE
        |  (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
        |    AND l.l_quantity BETWEEN 1 AND 11)
        |  OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
        |    AND l.l_quantity BETWEEN 10 AND 20)
        |  OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 35
        |    AND l.l_quantity BETWEEN 20 AND 30)
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin,
    "complex_market_share" ->
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CASE WHEN sn.n_name = 'NATION_13'
        |    THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS nation_rev_c,
        |  CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_rev_c,
        |  CAST(round(sum(CASE WHEN sn.n_name = 'NATION_13'
        |      THEN CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT)
        |      ELSE 0 END) * 10000.0
        |    / sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount) * 100) AS BIGINT))) AS BIGINT) AS share_bp
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        |JOIN region r ON cn.n_regionkey = r.r_regionkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        |WHERE p.p_type = 'ECONOMY'
        |  AND r.r_name = 'EUROPE'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "complex_order_priority" ->
      """SELECT o.o_orderpriority, count(*) AS n_orders
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin,
    "complex_cust_distribution" ->
      """WITH co AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c
        |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM co
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "complex_small_qty_revenue" ->
      """SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c,
        |  count(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#23'
        |  AND 2 * CAST(round(l.l_quantity * 100) AS BIGINT)
        |      * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |    < (SELECT sum(CAST(round(l2.l_quantity * 100) AS BIGINT))
        |       FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin,
    "complex_waiting_suppliers" ->
      """SELECT s.s_name, count(*) AS numwait
        |FROM supplier s
        |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |WHERE o.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, s.s_name
        |LIMIT 20""".stripMargin,
    "complex_sales_opportunity" ->
      """WITH tot AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS sum_c
        |  FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9)
        |    AND CAST(round(c_acctbal * 100) AS BIGINT) > 0)
        |SELECT c.c_nationkey, count(*) AS n_cust,
        |  CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c_sum
        |FROM customer c, tot
        |WHERE c.c_nationkey IN (1, 3, 5, 7, 9)
        |  AND CAST(round(c.c_acctbal * 100) AS BIGINT) * tot.n > tot.sum_c
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c.c_nationkey
        |ORDER BY c.c_nationkey""".stripMargin,
    "complex_scd2" ->
      """WITH s AS (
        |  SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) // 5000 AS tier,
        |    epoch_ns(ts) AS tns, event_id
        |  FROM events WHERE event_type = 'signup'),
        |chg AS (
        |  SELECT user_id, tier, tns, event_id,
        |    lag(tier) OVER (PARTITION BY user_id ORDER BY tns, event_id) AS prev
        |  FROM s),
        |runs AS (
        |  SELECT user_id, tier, tns, event_id FROM chg
        |  WHERE prev IS NULL OR prev <> tier)
        |SELECT user_id, tier,
        |  tns // 1000000000 AS valid_from_s,
        |  (lead(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id)) // 1000000000 AS valid_to_s
        |FROM runs
        |ORDER BY user_id, valid_from_s""".stripMargin,
    "complex_product_profit" ->
      """SELECT n_name,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |           - CAST(round(p_retailprice * 100) AS BIGINT)
        |             * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS profit_c
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY n_name, o_year
        |ORDER BY n_name, o_year""".stripMargin,
    "complex_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, rev_c
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_c = (SELECT max(rev_c) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "complex_supplier_variety" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM ps JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 14, 21)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
}
