package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

/** Spark 4's arbitrary-state API (`transformWithState` /
  * StatefulProcessor) — the successor to flatMapGroupsWithState with
  * per-state TTL and composable typed state variables (SURVEY.md §2.8
  * stateful-op surface).
  *
  * Tracks a running per-user event count + value sum in a ValueState
  * (no TTL here — pass a TTLConfig with TimeMode.ProcessingTime to
  * bound idle state in a long-running deployment), emitting the updated
  * totals per batch.
  */
class RunningTotalsProcessor
  extends StatefulProcessor[Long, StreamEvent, UserRunning] {

  @transient private var state: ValueState[UserRunning] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[UserRunning](
      "running", Encoders.product[UserRunning], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[StreamEvent],
                               timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[UserRunning] = {
    val prev = Option(state.get()).getOrElse(UserRunning(key, 0L, 0.0))
    val next = rows.foldLeft(prev)((acc, e) =>
      UserRunning(key, acc.n_events + 1, acc.sum_value + e.value))
    state.update(next)
    Iterator.single(next)
  }
}

object SessionProcessor {

  /** transformWithState twin of EventStreams.runningUserTotals. */
  def runningUserTotals(events: Dataset[StreamEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalsProcessor,
        TimeMode.None(),
        OutputMode.Append())
  }
}
