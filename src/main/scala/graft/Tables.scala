package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query receives `(spark, sfDir)` and loads only the tables it needs
  * so parquet column pruning + predicate pushdown stay effective — at 100 TB
  * the scan is the dominant cost, and a pruned scan is the single biggest
  * lever (SURVEY.md §4).
  */
object Tables {
  /** Resolved-table cache, one per live session (weak keys: a stopped
    * session's entries must not pin its JVM state). `spark.read.parquet`
    * re-lists files and re-reads footers to infer the schema on EVERY
    * call; a real engine resolves a table through its catalog once. With
    * ~120 queries × 1-7 tables × warm+timed passes, the repeated footer
    * inference is pure per-query session floor — this is metadata
    * caching, not data caching (the DataFrame is an unexecuted logical
    * relation; scans still read parquet every run).
    */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, DataFrame]())
      .computeIfAbsent(s"$dir/$name.parquet", p => spark.read.parquet(p))

  /** `events` with a real timestamp column `ts_utc` (µs precision)
    * alongside the canonical ns-long `ts`. Oracle queries must still never
    * emit raw ns (SURVEY.md §7.5): derive second-granular values from
    * `ts_utc`/`ts`.
    */
  def eventsTs(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("ts_utc", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** Canonical events reader: `ts` is ALWAYS ns-since-epoch BIGINT here,
    * whatever the parquet physical type. The corpus has shipped as both
    * TIMESTAMP(NANOS) (Spark 4 refuses to read it as a timestamp; the
    * legacy flag `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it
    * as a raw ns long — set it AT SESSION CONSTRUCTION, as every entry
    * point here does; this reader is pure and mutates no session state)
    * and TIMESTAMP(MICROS) (reads as TimestampType; `unix_micros × 1000`
    * is exact integer math). Every downstream operator does exact
    * integer-ns arithmetic on `ts`, so normalizing once at the reader
    * keeps all bucket/gap/interval math engine-stable (SURVEY.md §7.5.4)
    * across generations.
    */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventsTs(table(s, d, "events"))

  /** Normalize an events frame so `ts` is ns-since-epoch BIGINT whatever
    * the physical type it was read as (nanos-as-long passes through;
    * timestamp types convert via exact integer `unix_micros × 1000`).
    * Parquet written by pandas/arrow surfaces as TIMESTAMP_NTZ, which
    * `unix_micros` rejects — the NTZ→LTZ cast interprets the wall time
    * in the session zone, so the session zone MUST be UTC (the oracle
    * reads the same naive µs values as-is, i.e. as UTC). This is
    * asserted, not set: a reader must not mutate global session state
    * (round-6 advice). Every entry point (Bench/Verify/ScaleBench/
    * SparkSpec) pins UTC in its builder. Shared by the catalog reader
    * above and ScaleBench's replicated corpus reader.
    */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ =>
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts normalization interprets NTZ wall times in the session zone; " +
          s"need spark.sql.session.timeZone=UTC at session construction, got '$tz'")
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts AS timestamp)) * 1000"))
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
