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

  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark 4 refuses to
    * read as a timestamp. Read it as a raw ns-since-epoch long instead and
    * expose `ts_utc` (µs precision, exact integer division — no float
    * noise) alongside. Oracle queries must still never emit raw ns
    * (SURVEY.md §7.5): derive second-granular values from `ts_utc`/`ts`.
    */
  def eventsTs(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts_utc", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
