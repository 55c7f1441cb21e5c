package graft.marine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end marine pipeline (SURVEY.md §2.10): raw NMEA log → typed
  * sentences → clocked long-form channels → aligned wide table → derived
  * wind/VMG → races/maneuvers/stats → replay JSON.
  *
  * Clock assignment: only RMC sentences carry UTC; every other sentence
  * inherits the latest preceding RMC time in log order — the same as-of
  * carry-forward plan used by join_asof, keyed on the file line number.
  */
object Marine {

  /** Read + parse, preserving log order via monotonically_increasing_id
    * (monotone within and across splits of a file scan — the standard
    * distributed line-order handle; no collect, no single-partition
    * coalesce).
    */
  def readLog(spark: SparkSession, path: String): DataFrame =
    Nmea.parse(
      spark.read.text(path).withColumn("line_no", monotonically_increasing_id()))

  /** Epoch-seconds clock from an RMC row's date (ddmmyy, field 9) +
    * time (hhmmss.ss, field 1) — a full instant, so multi-day logs keep
    * real gaps (seconds-since-midnight alone would wrap at each day and
    * hide them from race splitting).
    */
  private def rmcEpochSeconds: org.apache.spark.sql.Column = {
    val date = element_at(col("fields"), 9)
    unix_timestamp(to_date(concat(lit("20"), substring(date, 5, 2), lit("-"),
      substring(date, 3, 2), lit("-"), substring(date, 1, 2)))).cast("double") +
      Nmea.utcSeconds(element_at(col("fields"), 1))
  }

  /** Full wide table: clocked long-form channels → aligned + derived
    * true wind and VMG, one row per clock tick.
    */
  def wideTable(parsed: DataFrame): DataFrame = {
    val byLine = Window.orderBy("line_no")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val clocked = parsed
      .withColumn("ts",
        last(when(col("stype") === "RMC", rmcEpochSeconds),
          ignoreNulls = true).over(byLine))
      .filter(col("ts").isNotNull)

    def longRows(df: DataFrame, stackExpr: String): DataFrame =
      df.select(col("ts"), expr(stackExpr)).select("ts", "channel", "value")

    val rmcRows = longRows(
      clocked.filter(col("stype") === "RMC")
        .withColumn("lat", Nmea.coord(element_at(col("fields"), 3), element_at(col("fields"), 4)))
        .withColumn("lon", Nmea.coord(element_at(col("fields"), 5), element_at(col("fields"), 6)))
        .withColumn("sog_kn", element_at(col("fields"), 7).cast("double"))
        .withColumn("cog_deg", element_at(col("fields"), 8).cast("double")),
      "stack(4, 'lat', lat, 'lon', lon, 'sog', sog_kn, 'cog', cog_deg) AS (channel, value)")
    val vhwRows = longRows(
      clocked.filter(col("stype") === "VHW")
        .withColumn("hdg_true", element_at(col("fields"), 1).cast("double"))
        .withColumn("stw", element_at(col("fields"), 5).cast("double")),
      "stack(2, 'hdg', hdg_true, 'stw', stw) AS (channel, value)")
    val mwvRows = longRows(
      clocked.filter(col("stype") === "MWV" && element_at(col("fields"), 2) === "R")
        .withColumn("awa", element_at(col("fields"), 1).cast("double"))
        .withColumn("aws", element_at(col("fields"), 3).cast("double")),
      "stack(2, 'awa', awa, 'aws', aws) AS (channel, value)")
    val dptRows = longRows(
      clocked.filter(col("stype") === "DPT")
        .withColumn("depth", element_at(col("fields"), 1).cast("double")),
      "stack(1, 'depth', depth) AS (channel, value)")

    val names = Seq("lat", "lon", "sog", "cog", "hdg", "stw", "awa", "aws", "depth")
    val aligned = Channels.align(
      rmcRows.unionByName(vhwRows).unionByName(mwvRows).unionByName(dptRows), names)

    // One row per instant: several sentences share an RMC clock tick, and
    // the carry-forward is cumulative over (ts, channel) order, so the row
    // with the greatest channel name in each tick holds the final state.
    val oneRow = aligned
      .withColumn("__chan", col("channel"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("ts").orderBy(col("__chan").desc)))
      .filter(col("rn") === 1).drop("rn", "__chan")

    // signed AWA convention: sentences give 0-360; fold to [-180, 180]
    val signedAwa = when(col("awa") > 180, col("awa") - 360).otherwise(col("awa"))
    oneRow
      .drop("channel", "value")
      .withColumn("awa_signed", signedAwa)
      .withColumn("tws", round(Derived.tws(col("aws"), col("awa_signed"), col("stw")), 6))
      .withColumn("twa", round(Derived.twa(col("aws"), col("awa_signed"), col("stw")), 6))
      .withColumn("twd", round(Derived.twd(col("hdg"), col("twa")), 6))
      .withColumn("vmg", round(Derived.vmg(col("sog"), col("twa")), 6))
      .orderBy("ts")
  }

  /** Full pipeline: log path → per-race replay docs, ready for
    * write.json.
    */
  def replayFromLog(spark: SparkSession, path: String,
                    raceGapSeconds: Double = 1800): DataFrame = {
    val wide = wideTable(readLog(spark, path))
    val races = Races.split(wide.filter(col("lat").isNotNull), raceGapSeconds)
    Races.replayDocs(races, Seq("lat", "lon", "sog", "hdg", "tws", "twa", "vmg"))
  }
}
