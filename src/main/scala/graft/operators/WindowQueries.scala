package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** SURVEY.md §2.5 — window functions.
  *
  * All windows partition by a real key (nation / user / event_type), so at
  * scale each executes as ONE hash Exchange on the partition key + an
  * in-partition sort — no global sort, no driver state. Determinism: every
  * window ordering carries a unique-key tiebreaker wherever the function's
  * result depends on order within ties (row_number, ntile, frames), per
  * SURVEY.md §7.5.
  */
object WindowQueries extends QueryPack {

  /** rank/dense_rank keep tie semantics (ordered by acctbal alone);
    * row_number gets a custkey tiebreaker to stay deterministic.
    */
  private def winRank(s: SparkSession, dir: String): DataFrame = {
    val byBal    = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"))
    val byBalKey = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, dir)
      .select(
        col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        row_number().over(byBalKey).cast("long").as("rn"),
        rank().over(byBal).cast("long").as("rnk"),
        dense_rank().over(byBal).cast("long").as("drnk"))
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** Top-3 per nation — the rank≤k pattern. At scale this beats a global
    * sort: partial top-k per partition, then k rows per group shuffle.
    */
  private def winTopkPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** Running totals are order-defined, so both engines add in the same
    * sequence; cents-scaling still guards the emit (SURVEY.md §7.5).
    */
  private def winRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w) * 100).cast("long").as("run_total_c"),
        count(lit(1)).over(w).as("run_n"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Centered ±2-row moving average per user — sensor-smoothing shape. */
  private def winSlidingRows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, 2)
    Tables.events(s, dir)
      .select(
        col("user_id"), col("event_id"),
        round(avg("value").over(w), 4).as("smooth_value"),
        count(lit(1)).over(w).as("frame_n"))
      .orderBy(col("event_id"))
  }

  /** Value-range frame: tied order values share one frame, so no
    * tiebreaker is needed for determinism.
    */
  private def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val frame = "OVER (PARTITION BY event_type ORDER BY value RANGE BETWEEN 10.0 PRECEDING AND CURRENT ROW)"
    Tables.events(s, dir)
      .select(
        col("event_id"), col("event_type"), col("value"),
        expr(s"CAST(round(sum(value) $frame * 100) AS BIGINT)").as("band_sum_c"),
        expr(s"count(*) $frame").as("band_n"))
      .orderBy(col("event_id"))
  }

  private def winLagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(
        col("user_id"), col("event_id"),
        lag("event_id", 1).over(w).as("prev_id"),
        lead("event_id", 1).over(w).as("next_id"),
        expr("(ts - lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)) DIV 1000000000").as("gap_s"))
      .orderBy(col("event_id"))
  }

  /** ntile/percent_rank/cume_dist — pure rational functions of rank and
    * partition size, so unrounded doubles still match bit-for-bit.
    */
  private def winAnalytic(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, dir)
      .select(
        col("c_nationkey"), col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  private def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), asc("c_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.customer(s, dir)
      .select(
        col("c_nationkey"), col("c_custkey"),
        first("c_acctbal").over(w).as("best_bal"),
        last("c_acctbal").over(w).as("worst_bal"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  /** nth_value from the top of each nation + ignore-nulls lag (carry the
    * most recent non-null preceding value). The default growing frame is
    * identical in both engines, so second_best is null until two rows
    * are in frame.
    */
  private def winNthValue(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey").orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, dir)
      .select(
        col("c_nationkey"), col("c_custkey"),
        nth_value(col("c_acctbal"), 2).over(w).as("second_best"),
        lag(expr("CASE WHEN c_acctbal > 0 THEN c_acctbal END"), 1, null,
          ignoreNulls = true).over(w).as("prev_pos_bal"))
      .orderBy(col("c_nationkey"), col("c_custkey"))
  }

  /** Rolling MEDIAN over a trailing 5-row frame — the robust-smoothing
    * twin of the moving average (a sensor spike shifts a mean for 5
    * rows but a median not at all). Exact `percentile` over integer
    * cents: the median of ≤5 ints is an int or an exact .5, so the
    * double is bit-identical to DuckDB's interpolating quantile_cont.
    */
  private def winRollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("event_id")
      .rowsBetween(-4, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("v_c"))
      .withColumn("med_c", percentile(col("v_c"), lit(0.5)).over(w))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** Scale-safe twin of [[winRollingMedian]] (SURVEY.md §7.7, judged weak
    * at 100× because event_type has 5 values): identical result via
    * order-axis chunking — interior frames stay inside (event_type, chunk)
    * sub-partitions, only chunk-boundary rows re-window globally. Shares
    * the naive key's oracle SQL verbatim: same answer, scalable plan.
    */
  private def winRollingMedianScalable(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("v_c"))
    graft.pipeline.ScalableWindows.trailingRows(
        base, Seq("event_type"), Seq("event_id"),
        col("event_id") / 2000, lookback = 4)(w =>
        Seq(percentile(col("v_c"), lit(0.5)).over(w).as("med_c")))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** Scale-safe RANGE-frame twin (SURVEY.md §7.7): the 10.00-unit trailing
    * band re-expressed in integer cents and decomposed into in-bucket
    * prefix + whole-bucket cumulative + lower-edge suffix (see
    * [[graft.pipeline.ScalableWindows.trailingRangeSumCount]]). Integral
    * arithmetic end-to-end, so the oracle hash-compare is exact.
    */
  private def winRangeFrameScalable(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("v_c"))
    graft.pipeline.ScalableWindows.trailingRangeSumCount(
        base, Seq("event_type"), "v_c", band = 1000L, bucketWidth = 1000L,
        sumName = "band_sum_c", cntName = "band_n")
      .orderBy(col("event_id"))
  }

  /** Forward-fill (last observation carried forward) — the sensor/feature
    * gap-fill shape of a training pipeline: per user, carry the most
    * recent click value and the first purchase value seen so far, via
    * last/first IGNORE NULLS over a running frame. Partitioned on the
    * high-cardinality user key, so at scale this is one hash Exchange +
    * an in-partition sort, no low-cardinality trap. Values pass through
    * unrounded — no arithmetic touches them. Ordering (ts, event_id) is
    * unique, so the fill is deterministic.
    */
  private def winFillForward(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        when(col("event_type") === "click", col("value")).as("click_v"),
        when(col("event_type") === "purchase", col("value")).as("purchase_v"))
      .select(col("user_id"), col("event_id"),
        last(col("click_v"), ignoreNulls = true).over(w).as("last_click"),
        first(col("purchase_v"), ignoreNulls = true).over(w).as("first_purchase"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_fill_forward"            -> (winFillForward _),
    "win_rolling_median_scalable" -> (winRollingMedianScalable _),
    "win_range_frame_scalable"    -> (winRangeFrameScalable _),
    "win_rolling_median" -> (winRollingMedian _),
    "win_nth_value"      -> (winNthValue _),
    "win_rank"           -> (winRank _),
    "win_topk_per_group" -> (winTopkPerGroup _),
    "win_running"        -> (winRunning _),
    "win_sliding_rows"   -> (winSlidingRows _),
    "win_range_frame"    -> (winRangeFrame _),
    "win_lag_lead"       -> (winLagLead _),
    "win_analytic"       -> (winAnalytic _),
    "win_first_last"     -> (winFirstLast _))

  val oracle: Map[String, String] = Map(
    // DuckDB wants IGNORE NULLS inside the argument list (same in-args
    // placement as win_nth_value's lag), so this one is not portable
    "win_fill_forward" ->
      """SELECT user_id, event_id,
        |  last_value(CASE WHEN event_type = 'click' THEN value END
        |    IGNORE NULLS) OVER w AS last_click,
        |  first_value(CASE WHEN event_type = 'purchase' THEN value END
        |    IGNORE NULLS) OVER w AS first_purchase
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    // identical SQL to win_rolling_median: same answer, scalable plan
    "win_rolling_median_scalable" ->
      """SELECT event_type, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS v_c,
        |  quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5)
        |    OVER (PARTITION BY event_type ORDER BY event_id
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med_c
        |FROM events
        |ORDER BY event_type, event_id""".stripMargin,
    "win_range_frame_scalable" ->
      """SELECT event_id, event_type, v_c,
        |  CAST(sum(v_c) OVER w AS BIGINT) AS band_sum_c,
        |  count(*) OVER w AS band_n
        |FROM (SELECT event_id, event_type,
        |        CAST(round(value * 100) AS BIGINT) AS v_c FROM events) t
        |WINDOW w AS (PARTITION BY event_type ORDER BY v_c
        |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "win_rolling_median" ->
      """SELECT event_type, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS v_c,
        |  quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5)
        |    OVER (PARTITION BY event_type ORDER BY event_id
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med_c
        |FROM events
        |ORDER BY event_type, event_id""".stripMargin,
    "win_nth_value" ->
      """SELECT c_nationkey, c_custkey,
        |  nth_value(c_acctbal, 2) OVER w AS second_best,
        |  lag(CASE WHEN c_acctbal > 0 THEN c_acctbal END IGNORE NULLS) OVER w AS prev_pos_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "win_rank" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
        |  rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
        |FROM customer
        |ORDER BY c_nationkey, rn""".stripMargin,
    "win_topk_per_group" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        |  FROM customer) t
        |WHERE rn <= 3
        |ORDER BY c_nationkey, rn""".stripMargin,
    "win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(sum(o_totalprice) OVER w * 100) AS BIGINT) AS run_total_c,
        |  count(*) OVER w AS run_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_sliding_rows" ->
      """SELECT user_id, event_id,
        |  round(avg(value) OVER w, 4) AS smooth_value,
        |  count(*) OVER w AS frame_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "win_range_frame" ->
      """SELECT event_id, event_type, value,
        |  CAST(round(sum(value) OVER w * 100) AS BIGINT) AS band_sum_c,
        |  count(*) OVER w AS band_n
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value
        |             RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "win_lag_lead" ->
      """SELECT user_id, event_id,
        |  lag(event_id, 1) OVER w AS prev_id,
        |  lead(event_id, 1) OVER w AS next_id,
        |  (epoch_ns(ts) - lag(epoch_ns(ts), 1) OVER w) // 1000000000 AS gap_s
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_analytic" ->
      """SELECT c_nationkey, c_custkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "win_first_last" ->
      """SELECT c_nationkey, c_custkey,
        |  first_value(c_acctbal) OVER w AS best_bal,
        |  last_value(c_acctbal) OVER w AS worst_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY c_nationkey, c_custkey""".stripMargin)
}
