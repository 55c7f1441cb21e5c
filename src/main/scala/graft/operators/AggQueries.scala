package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** SURVEY.md §2.4 — aggregation.
  *
  * All physical plans are the stock two-phase hash aggregate
  * (partial map-side combine → hash Exchange on grouping keys → final),
  * which is exactly the shape that scales to 100 TB: the shuffle carries
  * only one row per (partition × group), not the raw data.
  */
object AggQueries extends QueryPack {

  /** Flagship: TPC-H-Q1-style over lineitem — scan + filter + project +
    * partial/final hash agg + sort in one pipeline. Filter and the 8-column
    * projection both reach the parquet scan (PushedFilters / ReadSchema).
    */
  def aggGroupBy(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private def aggGlobal(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"))

  private def aggDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  private def aggHaving(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"))
      .filter(col("n_orders") >= 12)
      .orderBy(col("o_custkey"))

  /** Histogram of order totals in fixed $25k buckets — the width_bucket
    * shape done in exact integer arithmetic (per-row cents, integer floor
    * division) so bucket membership can never drift across engines the
    * way a double boundary compare could. One partial/final hash agg on
    * ~20 bucket keys: at 100 TB the shuffle carries one row per
    * (partition × bucket), nothing else.
    */
  private def aggHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(expr("cents DIV 2500000").as("bucket"), col("cents"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"))
      .select(col("bucket"), (col("bucket") * 25000).as("bucket_lo_usd"),
        col("n_orders"), col("sum_cents"), col("min_cents"), col("max_cents"))
      .orderBy(col("bucket"))

  /** region→nation hierarchy with subtotals at each level + grand total.
    * Group-key nulls produced by the rollup are ordered NULLS FIRST
    * explicitly on both sides (engine defaults differ).
    */
  private def aggRollup(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        round(sum("c_acctbal") * 100).cast("long").as("sum_bal_c"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  private def aggCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum("l_quantity") * 100).cast("long").as("sum_qty_c"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  private def aggGroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq()),
        col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_cust"),
        round(sum("c_acctbal") * 100).cast("long").as("sum_bal_c"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** Pivot with the value list pinned (no discovery pass — at scale that
    * extra distinct scan is pure waste); counts coalesced to 0 to match
    * the conditional-aggregation oracle form.
    */
  private def aggPivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    pivoted.select(
      col("user_id") +: types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy(col("user_id"))
  }

  /** Statistical moments + bivariate stats per group. Both engines use
    * streaming one-pass moment merges whose float results can drift a
    * ulp with partition order, so every output is rounded (§7.5).
    */
  private def aggStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(stddev_samp(col("value")), 4).as("sd"),
        round(var_samp(col("value")), 4).as("variance"),
        round(covar_samp(col("value"), col("user_id").cast("double")), 4).as("cv"),
        round(corr(col("value"), col("user_id").cast("double")), 4).as("cr"))
      .orderBy(col("event_type"))

  /** Higher distribution-shape moments — population skewness and excess
    * kurtosis per group, the feature-QA statistics `agg_stats` (2nd
    * moment) stops short of. The float discipline that makes them
    * hash-exact cross-engine: raw power sums Σv..Σv⁴ accumulate as
    * EXACT integers over value bucketed to thousands (600⁴·|group| stays
    * far under 2⁶³ — the bucketing is the documented price of exact
    * integer moments), and the shape formulas then run an identical
    * double operand sequence in both engines, rounded once at emission.
    * Spark's own `skewness`/`kurtosis` are one-pass float merges whose
    * partition-order drift the round-4 contract cannot absorb in
    * general; the integer-sums form needs no such luck. One
    * partial-aggregable exchange to |status| rows.
    */
  private def aggMoments(s: SparkSession, dir: String): DataFrame =
    momentsCore(Tables.orders(s, dir))

  def momentsCore(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderstatus").as("status"),
        expr("CAST(floor(o_totalprice / 1000) AS BIGINT)").as("v"))
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"),
        sum(col("v") * col("v") * col("v")).as("s3"),
        sum(col("v") * col("v") * col("v") * col("v")).as("s4"))
      .selectExpr("status", "n",
        // m_k = k-th raw moment; central-moment identities inline so the
        // operand sequence is the oracle text verbatim
        "round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_k",
        """round(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          | - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |   * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 4) AS var_k""".stripMargin,
        """round(
          | (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
          |  - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
          |  + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
          | / nullif((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          |     - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |       * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
          |    * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          |     - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |       * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))), 0.0), 4) AS skew""".stripMargin,
        """round(
          | (CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
          |  - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
          |  + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
          |  - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
          | / nullif((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          |     - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |       * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
          |    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
          |     - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
          |       * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))), 0.0) - 3.0, 4)
          | AS kurt_excess""".stripMargin)
      .orderBy(col("status"))

  /** Exact quartiles per group via the exact `percentile` aggregate
    * (collects the group — fine for bounded group counts; the 100 TB
    * twin is approx_percentile, excluded from the oracle because its
    * sketch cannot hash-match DuckDB's).
    */
  private def aggMedian(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        round(percentile(col("value"), lit(0.25)), 4).as("q25"),
        round(percentile(col("value"), lit(0.5)), 4).as("q50"),
        round(percentile(col("value"), lit(0.75)), 4).as("q75"))
      .orderBy(col("event_type"))

  /** Linear-regression aggregates: slope / intercept / r² / count of
    * extendedprice on quantity per returnflag. Like the other moment
    * aggregates these are one-pass co-moment merges (partial map-side,
    * exact integer count); float drift is a low-ulp effect, so slope and
    * r² round at 4 decimals and the large-magnitude intercept at 2 —
    * the same absolute-tolerance class per unit value (§7.5).
    */
  private def aggRegression(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy(col("l_returnflag"))

  /** arg-max / arg-min: the value carried by the extreme of a UNIQUE
    * ordering column (event_id), so ties cannot make the pick
    * nondeterministic; values pass through unrounded (no arithmetic).
    */
  private def aggMinmaxBy(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        max_by(col("value"), col("event_id")).as("last_value"),
        min_by(col("value"), col("event_id")).as("first_value"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))

  /** Conditional / boolean aggregates — count_if + bool_and/bool_or are
    * plain partial+final hash aggregates (one boolean per group in the
    * shuffle).
    */
  private def aggCountIf(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(
        expr("count_if(c_acctbal > 0)").cast("long").as("n_pos"),
        expr("bool_and(c_acctbal > -1000)").as("all_above"),
        expr("bool_or(c_acctbal > 9000)").as("any_rich"),
        count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))

  /** Ordered string aggregation. collect_list order is partition-
    * dependent, so the array is sorted before joining — ≡ DuckDB
    * `string_agg(... ORDER BY ...)` (both engines compare ASCII
    * binary). Bounded to a fixed key slice so the string stays small at
    * any SF.
    */
  private def aggString(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") < 50)
      .groupBy(col("c_nationkey"))
      .agg(
        array_join(array_sort(collect_list(col("c_name"))), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))

  /** Deterministic MODE per group: the most frequent quantity, smallest
    * value on count ties (a bare `mode()` leaves tie survivors to the
    * engine — unusable under a hash compare). Two-level plan: the
    * (flag, qty) count aggregate is map-side partial on the fact, and
    * the row_number window runs over the tiny counts table (groups ×
    * ≤50 distinct quantities), never the fact — the window's
    * low-cardinality partition key is safe BECAUSE its input is already
    * aggregate-sized. Quantities compare as exact integer cents.
    */
  private def aggMode(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(desc("n"), asc("qty_c"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("l_returnflag"), col("qty_c").as("mode_qty_c"), col("n"))
      .orderBy(col("l_returnflag"))
  }

  /** The two middle order statistics of a frequency histogram, per
    * event_type: returns (event_type, n, s2) where s2 = the SUM of the
    * values at 1-based positions (n−1) DIV 2 + 1 and n DIV 2 + 1 of the
    * value-sorted multiset — so s2/2 is exactly `quantile_cont(0.5)`
    * (the positions coincide for odd n; for even n the 0.5 interpolation
    * is the midpoint, and halving integer-valued doubles is
    * float-exact). s2 stays in the INTEGER domain so madCore can derive
    * the deviation histogram exactly. Order-statistic read shared via
    * [[graft.pipeline.HistogramQuantiles]].
    */
  private def histMid(hist: DataFrame, v: String): DataFrame =
    graft.pipeline.HistogramQuantiles.orderStats(hist, "event_type", v, 2, Seq(1))
      .select(col("event_type"), col("n"), (col("lo1") + col("hi1")).as("s2"))

  /** Robust statistics per event_type: exact MEDIAN and MAD (median
    * absolute deviation — the outlier-resistant spread measure behind
    * robust z-scores) of value cents. MAD needs the median of
    * |x − median(x)| — naively two buffering `percentile` passes, each
    * holding a fifth of the corpus per group buffer at 5 types.
    *
    * Here the corpus is scanned ONCE: the (type, cents) frequency
    * histogram is a sufficient statistic for BOTH medians, because the
    * deviation histogram derives from the value histogram by the
    * per-bin map d2 = |2·v − (v_lo+v_hi)| and re-aggregation — no
    * second pass over raw rows, and every window in the plan runs over
    * histogram bins (distinct cents, value-range-bounded), never the
    * corpus. All arithmetic until the final halving is exact integers
    * doubled to dodge the half-cent median; the emitted doubles are
    * dyadic (s2/2, s2/4), so they equal DuckDB's interpolating
    * quantile_cont/mad bit-for-bit.
    */
  /** The integer core shared by agg_mad and agg_robust_outliers:
    * per event_type, (n, s2, ds2) where s2 = 2·median (of cents) and
    * ds2 = 4·MAD — both EXACT longs (sums of bracketing order
    * statistics, see [[histMid]]), so downstream consumers can stay in
    * integer arithmetic and only the final presentation divides.
    */
  private[operators] def madInts(events: DataFrame): DataFrame = {
    val hist = events
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("event_type"), col("v_c"))
      .agg(count(lit(1)).as("cnt"))
    val m = histMid(hist, "v_c")
    // r15: the median rides the deviation histogram as a carried column
    // (m2 is constant per type, so max() over either aggregate is the
    // identity) and the deviation histogram's total count IS the value
    // histogram's n — so the deviation-side order statistics return
    // everything madInts emits and the old m ⋈ d rejoin (plus its
    // broadcast build) disappears from the plan.
    val hist2 = hist
      .join(broadcast(m.select(col("event_type").as("mt"), col("s2").as("m2"))),
        col("event_type") === col("mt"))
      .select(col("event_type"), abs(col("v_c") * 2 - col("m2")).as("d2"),
        col("cnt"), col("m2"))
      .groupBy(col("event_type"), col("d2"))
      .agg(sum(col("cnt")).as("cnt"), max(col("m2")).as("m2"))
    graft.pipeline.HistogramQuantiles
      .orderStats(hist2, "event_type", "d2", 2, Seq(1),
        Seq(max(col("m2")).as("m2")))
      .select(col("event_type"), col("n"), col("m2").as("s2"),
        (col("lo1") + col("hi1")).as("ds2"))
  }

  def madCore(events: DataFrame): DataFrame =
    madInts(events)
      .select(col("event_type"), col("n"),
        (col("s2") / 2.0).as("median_c"), (col("ds2") / 4.0).as("mad_c"))

  private def aggMad(s: SparkSession, dir: String): DataFrame =
    madCore(Tables.events(s, dir)).orderBy(col("event_type"))

  /** ROBUST OUTLIER counts per event_type — the median/MAD anomaly gate
    * (the spread measure a contaminated distribution cannot drag, unlike
    * mean/stddev): an event is an outlier when |value − median| > 3·MAD.
    * The decision is EXACT INTEGER arithmetic end-to-end: multiplying
    * the inequality by 4 gives |4·v_c − 2·s2| > 3·ds2 with s2 = 2·median
    * and ds2 = 4·MAD both integer (see [[madInts]]) — no float
    * threshold, no 1.4826 scaling constant to drift cross-engine.
    *
    * Scale shape: the stats side is the one-scan histogram pipeline
    * (tiny, ≤ |types| rows out), broadcast back onto a second corpus
    * scan whose partial-aggregating count is the only wide edge — the
    * same two-scan-plus-broadcast shape as evt_zscore, with the robust
    * statistic in place of the moments.
    */
  def robustOutliersCore(events: DataFrame): DataFrame = {
    val stats = madInts(events)
      .select(col("event_type").as("st"), col("s2"), col("ds2"))
    // r15 (guide §1.1 first-principles — one pass where one suffices):
    // the outlier predicate |4·v_c − 2·s2| > 3·ds2 depends only on the
    // BIN value v_c, so the count folds over the histogram — n = Σ cnt,
    // n_out = Σ cnt over qualifying bins, exact integers either way.
    // The previous form re-scanned the whole corpus for the count; this
    // reads the (type, v_c) histogram the stats side already built (its
    // exchange is reused), so the corpus is scanned ONCE — at 100 TB
    // the key's input bytes halve.
    events
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("event_type"), col("v_c"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(stats), col("event_type") === col("st"))
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"),
        sum(when(abs(col("v_c") * 4 - col("s2") * 2) > col("ds2") * 3,
          col("cnt")).otherwise(0L)).as("n_out"))
      .select(col("event_type"), col("n"), col("n_out"),
        round(col("n_out").cast("double") / col("n"), 4).as("out_rate"))
  }

  private def aggRobustOutliers(s: SparkSession, dir: String): DataFrame =
    robustOutliersCore(Tables.events(s, dir)).orderBy(col("event_type"))

  /** Exact QUARTILES per event_type from the same frequency histogram —
    * [[histMid]] generalized from the median to any DYADIC quantile:
    * at q = k/4 the interpolation position h = (n−1)·k/4 has an exact
    * integer part ((n−1)·k) DIV 4 and an exact dyadic fraction
    * (rem/4 ∈ {0, ¼, ½, ¾}), so v_lo + frac·(v_hi − v_lo) replays
    * `quantile_cont(k/4)` bit-for-bit on integer-valued doubles (the
    * products are dyadic-exact; a non-dyadic q like 0.1 would round h
    * itself and is deliberately NOT offered). One corpus scan, one
    * partial-aggregating histogram build; the six order statistics
    * (lo/hi per quartile) come out of ONE conditional aggregate over
    * the cumulated bins — the scalable posture next to agg_median's
    * buffering `percentile`, which holds a fifth of the corpus per
    * group buffer at 5 types.
    */
  def quartilesCore(events: DataFrame): DataFrame = {
    val hist = events
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v_c"))
      .groupBy(col("event_type"), col("v_c"))
      .agg(count(lit(1)).as("cnt"))
    val stats = graft.pipeline.HistogramQuantiles
      .orderStats(hist, "event_type", "v_c", 4, Seq(1, 2, 3))
    val qs = (1 to 3).map(k =>
      graft.pipeline.HistogramQuantiles.interp(k, 4, s"q${k * 25}_c"))
    stats.select(col("event_type") +: col("n") +: qs: _*)
  }

  private def aggQuartilesScalable(s: SparkSession, dir: String): DataFrame =
    quartilesCore(Tables.events(s, dir)).orderBy(col("event_type"))

  /** WEIGHTED quartiles per return flag — each lineitem counts `quantity`
    * times (the reweighting statistic of sampling/mixing pipelines:
    * token-weighted length quantiles, unit-weighted price centers). The
    * LOWER weighted quantile at k/4 is the smallest value whose
    * cumulative weight reaches k/4 of the total (4·cum ≥ k·W) — a pure
    * integer decision, no interpolation, so it is engine-exact by
    * construction; k = 2 is the lower weighted median.
    *
    * Same scale posture as the rest of the histogram-quantile family:
    * the corpus sees ONE partial-aggregating scan into a (flag, cents)
    * → Σweight histogram; the cumulative read is the SHARED
    * [[graft.pipeline.HistogramQuantiles.lowerQuantiles]] (a weighted
    * multiset IS a frequency histogram, so the helper's `cnt` column
    * carries the weight), running over histogram bins — bounded by the
    * value range, not the row count. The oracle text is PORTABLE — ANSI
    * window sums run unmodified on both engines (the cumulative default
    * frame is RANGE-to-current in both; bins are unique per key so
    * RANGE ≡ ROWS).
    */
  def weightedMedianCore(lineitem: DataFrame): DataFrame = {
    val hist = lineitem
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("v_c"),
        col("l_quantity").cast("long").as("w"))
      .groupBy(col("l_returnflag"), col("v_c"))
      .agg(sum(col("w")).as("cnt"))
    graft.pipeline.HistogramQuantiles
      .lowerQuantiles(hist, "l_returnflag", "v_c", 4, Seq(1, 2, 3))
      .select(col("l_returnflag"), col("n").as("total_w"),
        col("wq1").as("wq25_c"), col("wq2").as("wmedian_c"),
        col("wq3").as("wq75_c"))
  }

  private def aggWeightedMedian(s: SparkSession, dir: String): DataFrame =
    weightedMedianCore(Tables.lineitem(s, dir)).orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_robust_outliers" -> (aggRobustOutliers _),
    "agg_weighted_median" -> (aggWeightedMedian _),
    "agg_quartiles_scalable" -> (aggQuartilesScalable _),
    "agg_mad"           -> (aggMad _),
    "agg_mode"          -> (aggMode _),
    "agg_minmax_by"     -> (aggMinmaxBy _),
    "agg_count_if"      -> (aggCountIf _),
    "agg_string"        -> (aggString _),
    "agg_groupby"       -> (aggGroupBy _),
    "agg_global"        -> (aggGlobal _),
    "agg_distinct"      -> (aggDistinct _),
    "agg_having"        -> (aggHaving _),
    "agg_rollup"        -> (aggRollup _),
    "agg_cube"          -> (aggCube _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "agg_pivot"         -> (aggPivot _),
    "agg_stats"         -> (aggStats _),
    "agg_moments"       -> (aggMoments _),
    "agg_median"        -> (aggMedian _),
    "agg_histogram"     -> (aggHistogram _),
    "agg_regression"    -> (aggRegression _))

  val oracle: Map[String, String] = Map(
    // PORTABLE: ANSI window sums; outer CASTs dodge DuckDB's
    // HUGEINT window-sum widening (BASELINE gotcha)
    "agg_weighted_median" ->
      """WITH h AS (
        |  SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS v_c,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY l_returnflag, v_c),
        |c AS (
        |  SELECT l_returnflag, v_c, w,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY v_c) AS cum,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM h)
        |SELECT l_returnflag, CAST(max(tot) AS BIGINT) AS total_w,
        |  min(CASE WHEN cum * 4 >= tot THEN v_c END) AS wq25_c,
        |  min(CASE WHEN cum * 4 >= tot * 2 THEN v_c END) AS wmedian_c,
        |  min(CASE WHEN cum * 4 >= tot * 3 THEN v_c END) AS wq75_c
        |FROM c GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // PORTABLE on purpose: `median` and `FILTER (WHERE ...)` run
    // unmodified on both engines (DuckDB median(BIGINT) probed DOUBLE
    // and bit-equal to quantile_cont), so this key needs no SqlTwin
    "agg_robust_outliers" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |m AS (
        |  SELECT event_type, median(v_c) AS med
        |  FROM ev GROUP BY event_type),
        |md AS (
        |  SELECT ev.event_type, median(abs(ev.v_c - m.med)) AS mad
        |  FROM ev JOIN m USING (event_type) GROUP BY ev.event_type)
        |SELECT ev.event_type, count(*) AS n,
        |  count(*) FILTER (WHERE abs(4 * ev.v_c - 4 * m.med) > 3 * 4 * md.mad) AS n_out,
        |  round(CAST(count(*) FILTER (WHERE abs(4 * ev.v_c - 4 * m.med) > 3 * 4 * md.mad) AS DOUBLE)
        |    / count(*), 4) AS out_rate
        |FROM ev JOIN m USING (event_type) JOIN md ON ev.event_type = md.event_type
        |GROUP BY ev.event_type
        |ORDER BY ev.event_type""".stripMargin,
    "agg_quartiles_scalable" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  quantile_cont(v_c, 0.25) AS q25_c,
        |  quantile_cont(v_c, 0.5) AS q50_c,
        |  quantile_cont(v_c, 0.75) AS q75_c
        |FROM ev GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // mad() = quantile_cont(|x − quantile_cont(x, .5)|, .5) in DuckDB
    // (probed); the histogram decomposition reproduces it bit-exactly
    "agg_mad" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  quantile_cont(v_c, 0.5) AS median_c,
        |  mad(v_c) AS mad_c
        |FROM ev GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "agg_mode" ->
      """WITH counts AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c,
        |    count(*) AS n
        |  FROM lineitem
        |  GROUP BY l_returnflag, qty_c),
        |ranked AS (
        |  SELECT l_returnflag, qty_c, n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY n DESC, qty_c ASC) AS rk
        |  FROM counts)
        |SELECT l_returnflag, qty_c AS mode_qty_c, n
        |FROM ranked
        |WHERE rk = 1
        |ORDER BY l_returnflag""".stripMargin,
    "agg_regression" ->
      """SELECT l_returnflag,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
        |  regr_count(l_extendedprice, l_quantity) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "agg_histogram" ->
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        |)
        |SELECT cents // 2500000 AS bucket,
        |  (cents // 2500000) * 25000 AS bucket_lo_usd,
        |  count(*) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  min(cents) AS min_cents,
        |  max(cents) AS max_cents
        |FROM c
        |GROUP BY 1, 2
        |ORDER BY bucket""".stripMargin,
    "agg_minmax_by" ->
      """SELECT event_type,
        |  max_by(value, event_id) AS last_value,
        |  min_by(value, event_id) AS first_value,
        |  max(event_id) AS max_id
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "agg_count_if" ->
      """SELECT c_nationkey,
        |  CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_pos,
        |  bool_and(c_acctbal > -1000) AS all_above,
        |  bool_or(c_acctbal > 9000) AS any_rich,
        |  count(*) AS n
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "agg_string" ->
      """SELECT c_nationkey,
        |  string_agg(c_name, ',' ORDER BY c_name) AS names,
        |  count(*) AS n
        |FROM customer
        |WHERE c_custkey < 50
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,
    "agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "agg_global" ->
      """SELECT count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "agg_having" ->
      """SELECT o_custkey,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin,
    "agg_rollup" ->
      """SELECT r_name, n_name,
        |  count(*) AS n_cust,
        |  CAST(round(sum(c_acctbal) * 100) AS BIGINT) AS sum_bal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n_rows,
        |  CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_c
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT r_name, n_name,
        |  count(*) AS n_cust,
        |  CAST(round(sum(c_acctbal) * 100) AS BIGINT) AS sum_bal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "agg_pivot" ->
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "agg_stats" ->
      """SELECT event_type, count(*) AS n,
        |  round(stddev_samp(value), 4) AS sd,
        |  round(var_samp(value), 4) AS variance,
        |  round(covar_samp(value, CAST(user_id AS DOUBLE)), 4) AS cv,
        |  round(corr(value, CAST(user_id AS DOUBLE)), 4) AS cr
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // PORTABLE: exact integer power sums, then one identical double
    // operand sequence per shape statistic (the engines' own
    // skewness/kurtosis are one-pass float merges — not hash-stable)
    "agg_moments" ->
      """WITH b AS (
        |  SELECT o_orderstatus AS status,
        |    CAST(floor(o_totalprice / 1000) AS BIGINT) AS v
        |  FROM orders),
        |s AS (
        |  SELECT status, count(*) AS n,
        |    CAST(sum(v) AS BIGINT) AS s1,
        |    CAST(sum(v * v) AS BIGINT) AS s2,
        |    CAST(sum(v * v * v) AS BIGINT) AS s3,
        |    CAST(sum(v * v * v * v) AS BIGINT) AS s4
        |  FROM b GROUP BY status)
        |SELECT status, n,
        |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_k,
        |  round(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |   - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |     * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 4) AS var_k,
        |  round(
        |   (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
        |    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |    + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |   / nullif((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))), 0.0), 4) AS skew,
        |  round(
        |   (CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
        |    - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
        |    + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |   / nullif((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
        |      * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
        |       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
        |         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))), 0.0) - 3.0, 4)
        |   AS kurt_excess
        |FROM s
        |ORDER BY status""".stripMargin,
    "agg_median" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 4) AS q25,
        |  round(quantile_cont(value, 0.5), 4) AS q50,
        |  round(quantile_cont(value, 0.75), 4) AS q75
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin)
}
