package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout helpers for the 100 TB posture (SURVEY.md §7.7):
  * partition-pruned parquet layouts. A time-partitioned fact table turns
  * every date-bounded query into a file-listing problem instead of a
  * scan — the single biggest lever once data outgrows one machine.
  */
object Layout {

  /** Write a fact table date-partitioned (one directory per day).
    * Queries filtering on `p_date` prune partitions at planning time —
    * verify with PartitionFilters in the scan node.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String,
                           extraPartitionCols: Seq[String] = Nil): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("p_date" +: extraPartitionCols: _*)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed layout for shuffle-free equi-joins on a hot key: both
    * sides pre-hashed into the same bucket count co-locate join keys, so
    * repeated joins skip their Exchange. Requires saveAsTable (bucket
    * metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, keyCol: String, buckets: Int,
                    table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
}
