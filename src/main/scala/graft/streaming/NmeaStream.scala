package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.marine.Nmea

/** Streaming NMEA ingest (SURVEY.md §7.6): the boat-computer's live
  * pipeline — tail a directory of growing/rotating log files, parse each
  * micro-batch with the SAME column expressions as the batch path, and
  * maintain watermarked per-minute channel aggregates.
  *
  * Batch/stream parity is the point: `Nmea.parseAll` is reused verbatim
  * (one definition of the sentence grammar), so anything the batch
  * pipeline computes can be lifted to the stream by swapping read for
  * readStream.
  */
object NmeaStream {

  /** File-source stream of raw log lines → parsed sentences. */
  def parsedStream(spark: SparkSession, dir: String): DataFrame = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", 16)
      .text(dir)
    // streaming sources forbid monotonically_increasing_id; sentence
    // order within a micro-batch is not needed for per-minute aggregates
    Nmea.parse(lines.withColumn("line_no", lit(0L)))
  }

  /** Per-minute speed stats over the RMC stream. Event time comes from
    * the sentence's own date+time fields (same as the batch clock), so a
    * stream crossing UTC midnight keeps monotone event time instead of
    * wrapping 24 h behind the watermark.
    */
  def minuteStats(parsed: DataFrame): DataFrame = {
    val f = (i: Int) => element_at(col("fields"), i)
    val date = f(9)
    val epoch = unix_timestamp(to_date(concat(lit("20"), substring(date, 5, 2), lit("-"),
      substring(date, 3, 2), lit("-"), substring(date, 1, 2)))) +
      Nmea.utcSeconds(f(1)).cast("long")
    val rmc = parsed.filter(col("stype") === "RMC")
      .select(
        epoch.cast("timestamp").as("ts"),
        f(7).cast("double").as("sog"))
    rmc
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(
        count(lit(1)).as("n_fixes"),
        round(avg("sog"), 2).as("avg_sog"),
        round(max("sog"), 2).as("max_sog"))
      .select(col("window.start").as("minute"), col("n_fixes"),
        col("avg_sog"), col("max_sog"))
  }
}
