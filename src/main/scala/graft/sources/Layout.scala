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

  /** Morton (Z-order) value over `dims` numeric columns: each value is
    * normalized to a `bits`-bit integer over its [min, max] range
    * (equal-width; swap in approx-quantile boundaries for equal-depth
    * on skewed data), then the dimensions' bits are interleaved. Rows
    * close in z-value are close in EVERY dimension, so sorting files by
    * z-value gives each parquet file a narrow min/max envelope on every
    * dimension at once — the property that lets range filters on any
    * dim prune files, where a single-column sort clusters only itself.
    *
    * The interleave is plain shift/and/or column arithmetic (codegen
    * stays whole-stage; the classic magic-mask spreading would shave
    * constant factors but this form works for any (dims, bits) with
    * dims*bits ≤ 63). Ranges are caller-supplied so one aggregate scan
    * serves the whole write — see [[zorderWrite]].
    */
  def zvalue(dims: Seq[(org.apache.spark.sql.Column, Long, Long)],
             bits: Int = 16): org.apache.spark.sql.Column = {
    require(dims.nonEmpty && dims.size * bits <= 63,
      s"${dims.size} dims × $bits bits must fit a signed long")
    val stride = dims.size
    val maxBucket = (1L << bits) - 1
    dims.zipWithIndex.map { case ((c, lo, hi), d) =>
      require(hi >= lo, s"dimension $d range inverted")
      // [lo, hi] spanning more than Long.MaxValue (e.g. a Long.MinValue
      // null-sentinel next to real values) would wrap BOTH this span
      // and the per-row `c - lo` — silently collapsing every bucket.
      // Refuse loudly: sentinel cleanup is the caller's job.
      require(BigInt(hi) - BigInt(lo) <= Long.MaxValue,
        s"dimension $d range [$lo, $hi] exceeds Long.MaxValue — strip " +
          "sentinels or pre-normalize before z-ordering")
      // equal-width bucket in [0, 2^bits) with a POWER-OF-TWO width, so
      // the division is an exact shift: Column./ on longs is double
      // division (loses exactness past 2^53 — ns-epoch territory) and a
      // multiply-first form overflows the long. A degenerate (constant)
      // dimension lands every row in bucket 0.
      val span = math.max(1L, hi - lo)
      val spanBits = 64 - java.lang.Long.numberOfLeadingZeros(span)
      val shift = math.max(0, spanBits - bits)
      val bucket = least(lit(maxBucket), greatest(lit(0L),
        shiftright(c.cast("long") - lit(lo), shift)))
      // spread bucket bits to positions d, d+stride, d+2*stride, ...
      (0 until bits).map { i =>
        shiftleft(shiftright(bucket, i).bitwiseAND(lit(1L)), i * stride + d)
      }.reduce(_.bitwiseOR(_))
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order-clustered parquet write: range-partition then sort by the
    * Morton value so every output file covers a small hyper-rectangle
    * of the dimension space. One aggregate computes all ranges; the
    * write itself is one range Exchange + per-partition sort.
    */
  def zorderWrite(df: DataFrame, dimCols: Seq[String], path: String,
                  bits: Int = 16, partitions: Int = 0): Unit = {
    val aggs = dimCols.flatMap(c =>
      Seq(min(col(c).cast("long")), max(col(c).cast("long"))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    if (dimCols.indices.exists(i => row.isNullAt(2 * i))) {
      // empty input, an all-null dim, or a non-castable dim: there is
      // nothing to cluster on — write as-is instead of throwing an
      // opaque NPE where a plain write would have succeeded
      df.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val ranges = dimCols.indices.map(i => (row.getLong(2 * i), row.getLong(2 * i + 1)))
    val dims = dimCols.zip(ranges).map { case (c, (lo, hi)) => (col(c), lo, hi) }
    // grows-until-fresh: never silently replace (and then drop) a real
    // user column that happens to be named like our sort key
    val zCol = Iterator.iterate("__z")(_ + "_").dropWhile(df.columns.contains).next()
    val withZ = df.withColumn(zCol, zvalue(dims, bits))
    val shaped =
      if (partitions > 0) withZ.repartitionByRange(partitions, col(zCol))
      else withZ.repartitionByRange(col(zCol))
    shaped.sortWithinPartitions(zCol).drop(zCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** SMALL-FILE COMPACTION: rewrite a parquet directory's files into
    * ~`targetBytes` outputs at `outPath`, sized from the directory's
    * ACTUAL on-disk bytes (a row-count heuristic misestimates by the
    * compression ratio). The operational fix for what streaming sinks
    * and fine-grained partitioning do to a table over time — thousands
    * of KB-files turn every scan into a file-listing + task-overhead
    * problem long before bytes are the bottleneck (task scheduling is
    * per-file-split; parquet footers are per-file).
    *
    * Writes to a NEW directory and returns the output file count — the
    * swap (rename/retarget readers) is the caller's move, because a
    * safe in-place swap needs a table format's atomic commit (the
    * documented honest limit; plain directories get
    * write-new-then-repoint). `coalesce` (not `repartition`) merges
    * files WITHOUT a shuffle: compaction reads each input once and
    * writes it once — at 100 TB the difference between an IO-bound
    * rewrite and double-shuffling the table.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L << 20): Long = {
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val onDisk = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1L, (onDisk + targetBytes - 1) / targetBytes)
    spark.read.parquet(inPath)
      .coalesce(nFiles.toInt)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
