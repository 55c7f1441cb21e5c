package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event-time operators
  * (SURVEY.md §2.8/§7.6). Same logical shapes as EventTimeQueries —
  * window(), session_window(), dedup — but incremental over an unbounded
  * stream with watermark-bounded state. Deliberately outside the DuckDB
  * oracle (batch twins carry the correctness check); verified by
  * MemoryStream tests.
  *
  * A typed event row for streaming demos. */
case class StreamEvent(event_id: Long, ts: java.sql.Timestamp,
                       user_id: Long, event_type: String, value: Double)

/** Running per-user session state for the stateful operator demo. */
case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

object EventStreams {

  /** 1-hour tumbling counts per event_type; 10-min watermark bounds
    * state: windows older than (max event time − 10 min) finalize and
    * evict. Append mode → only closed windows are emitted, exactly-once
    * per window.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"), col("sum_value"))

  /** Event-time sessions with a 30-min gap via session_window — the
    * streaming-native form of evt_session's gaps-and-islands.
    */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Exactly-once dedup on event_id with watermark-bounded state —
    * duplicates arriving within the watermark horizon are dropped.
    */
  def dedupedWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream inner join: each purchase matched to the
    * same user's clicks within the preceding hour. Both inputs carry a
    * watermark AND the join condition carries an event-time band — that
    * pair is what lets the join evict buffered rows past the horizon
    * instead of holding both streams' state forever (the 100 TB/day
    * streaming posture; without the band Spark must keep every row).
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame =
    bandJoin(clicks, purchases, "inner")

  /** Left-outer twin: purchases with no prior click still emit (null
    * click columns) once the watermark proves no match can arrive.
    */
  def clickPurchaseJoinOuter(clicks: DataFrame, purchases: DataFrame): DataFrame =
    bandJoin(clicks, purchases, "left_outer")

  private def bandJoin(clicks: DataFrame, purchases: DataFrame,
                       joinType: String): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "10 minutes")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", "10 minutes")
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"),
      joinType)
  }

  /** Hourly OHLC bars per event_type — streaming twin of the batch
    * `evt_ohlc` key, and the same single-aggregate shape: open/close are
    * min_by/max_by keyed on an exact DECIMAL(38,0) encoding of the
    * unique (ts, event_id) composite, here over µs (the batch twin's ns
    * source scales by 10³ — same total order; both need
    * event_id < 10¹²). The aggregate merges
    * incrementally, so out-of-order arrivals within the watermark
    * horizon still land in event-time order; append mode emits each bar
    * exactly once when the watermark seals its hour.
    */
  def ohlcBars(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("okey",
        expr("CAST(unix_micros(ts) AS DECIMAL(38,0)) * 1000000000000 + event_id"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), col("okey")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("okey")).as("close"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("bar_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  /** Streaming expectation-suite monitor — the live face of the batch
    * `quality_expectations` key: per event-time tumbling window, one row
    * of rule-violation counts (value range, type set membership, user-id
    * sanity) an admission controller alerts on. Pure built-in windowed
    * aggregation — the sum(CASE) battery merges incrementally, so no
    * custom state is needed; append mode emits each window's verdict
    * exactly once when the watermark seals it, and state is one count
    * row per OPEN window.
    */
  def expectationWindows(events: DataFrame, windowLen: String = "1 hour",
                         watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("value") <= 0.0 || col("value") > 500.0, 1L)
          .otherwise(0L)).as("n_value_out_of_range"),
        sum(when(!col("event_type").isin("click", "view", "purchase",
          "signup", "error"), 1L).otherwise(0L)).as("n_type_invalid"),
        sum(when(col("user_id").isNull || col("user_id") < 0L, 1L)
          .otherwise(0L)).as("n_bad_user"))
      .select(col("w.start").as("wstart"), col("n_rows"),
        col("n_value_out_of_range"), col("n_type_invalid"), col("n_bad_user"))

  /** Custom stateful operator: running per-user totals via
    * flatMapGroupsWithState — the escape hatch when built-in windows
    * can't express the state machine (SURVEY.md §2.8).
    */
  def runningUserTotals(events: Dataset[StreamEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[StreamEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          val next = rows.foldLeft(prev)((acc, e) =>
            UserRunning(user, acc.n_events + 1, acc.sum_value + e.value))
          state.update(next)
          Iterator.single(next)
      }
  }
}
