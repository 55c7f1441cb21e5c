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
    Nmea.parseAll(lines.withColumn("line_no", lit(0L)))
      .filter(col("valid"))
  }

  /** Per-minute speed/depth stats over the RMC/DPT stream, keyed by
    * processing-assigned event time (RMC UTC seconds folded onto a
    * reference date — live logs are "today" by definition).
    */
  def minuteStats(parsed: DataFrame): DataFrame = {
    val f = (i: Int) => element_at(col("fields"), i)
    val rmc = parsed.filter(col("stype") === "RMC")
      .select(
        to_timestamp(lit("2024-01-01 00:00:00")).cast("long")
          .plus(Nmea.utcSeconds(f(1)).cast("long")).cast("timestamp").as("ts"),
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
