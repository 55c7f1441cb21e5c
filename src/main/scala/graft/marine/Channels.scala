package graft.marine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Channel alignment + resampling (SURVEY.md §2.10).
  *
  * A sailboat log interleaves sensor sentences at different rates; the
  * analysis wants one row per instant with every channel populated. That
  * is an as-of join of N sparse channels onto one clock — the same union
  * + window carry-forward plan as join_asof (SURVEY.md §7.4), with no
  * per-channel joins and no driver state.
  *
  * `align` uses an UNPARTITIONED window: a single log is one totally-
  * ordered sequence, so it serialises through one task by construction —
  * correct for one boat-day, NOT the fleet-scale path. At scale use
  * `alignByKey(boat_id)`: the Exchange hashes on the boat key and each
  * boat's log aligns independently in parallel.
  */
object Channels {

  /** Align a long-form channel table (ts, channel, value) onto every
    * observation instant: each output row carries the latest value of
    * every channel at or before ts.
    *
    * @param channels long-form input with columns (ts DOUBLE/seconds,
    *                 channel STRING, value DOUBLE)
    * @param names    the channel names to pivot out
    */
  def align(channels: DataFrame, names: Seq[String]): DataFrame = {
    val w = Window.orderBy(col("ts"), col("channel"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // keeps the input columns (incl. channel) so callers can pick the
    // final row per clock tick; project to (ts, names…) when done
    names.foldLeft(channels) { (df, name) =>
      df.withColumn(name,
        last(when(col("channel") === name, col("value")), ignoreNulls = true).over(w))
    }
  }

  /** Keyed variant for multi-boat logs: carry-forward within each boat
    * partition (this is the form a fleet-scale deployment uses — the
    * Exchange hashes on boat_id so alignment parallelises across boats).
    */
  def alignByKey(channels: DataFrame, keyCol: String, names: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("ts"), col("channel"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    names.foldLeft(channels) { (df, name) =>
      df.withColumn(name,
        last(when(col("channel") === name, col("value")), ignoreNulls = true).over(w))
    }
  }

  /** Fixed-rate downsample for replay export: tumbling 1-second (or any
    * width) buckets, mean per numeric channel, bucket start as the new
    * clock. Input: wide aligned table from `align`.
    */
  def resample(aligned: DataFrame, widthSeconds: Double, names: Seq[String]): DataFrame =
    aligned
      .withColumn("bucket", (floor(col("ts") / widthSeconds) * widthSeconds))
      .groupBy(col("bucket").as("ts"))
      .agg(names.map(n => avg(col(n)).as(n)).head,
        names.map(n => avg(col(n)).as(n)).tail: _*)
      .orderBy(col("ts"))
}
