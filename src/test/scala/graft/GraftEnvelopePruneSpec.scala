package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Manifest stat-envelope FILE pruning on the DSv2 doors: a filtered
  * SQL read of a statsCols table must plan a scan whose file list
  * excludes out-of-envelope files — never opening them, not even for
  * the footer — while returning rows identical to the unpruned read.
  * Covers the delete-free batch path, the merge-on-read path, and the
  * micro-batch stream's per-batch diff.
  */
class GraftEnvelopePruneSpec extends SparkSpec {

  private def mkTable(): String =
    Files.createTempDirectory("snapprune").toString + "/t"

  private def viaFormat(t: String) =
    spark.read.format("graft-snapshot").load(t)

  /** Files of every batch scan in the EXECUTED plan — resolved from the
    * planned InputPartitions, so envelope pruning (which removes files
    * before parquet plans) is directly visible. MoR partitions wrap a
    * FilePartition in a private carrier; unwrap reflectively.
    */
  private def scannedFiles(df: DataFrame): Seq[String] = {
    df.collect() // settle AQE if it applied
    def scans(p: SparkPlan): Seq[BatchScanExec] = p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case b: BatchScanExec => Seq(b)
    }.flatten
    scans(df.queryExecution.executedPlan)
      .flatMap(_.scan.toBatch.planInputPartitions().toSeq)
      .flatMap {
        case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq
        case other => // GraftMorPartition(inner, _) — private[sources]
          val m = other.getClass.getMethod("inner")
          m.setAccessible(true)
          m.invoke(other).asInstanceOf[FilePartition]
            .files.map(_.filePath.toString).toSeq
      }
  }

  /** Day-clustered table: 4 files, one day each, statsCols = day. */
  private def mkDayTable(): String = {
    import spark.implicits._
    val t = mkTable()
    (0 to 3).foreach { d =>
      SnapshotTable.append(spark, t,
        (0L until 50L).map(i => (d * 100L + i, d.toLong, s"v$d-$i"))
          .toDF("k", "day", "v").coalesce(1),
        statsCols = Seq("day"))
    }
    t
  }

  test("filtered SQL reads skip out-of-envelope files; rows identical to the unpruned read") {
    import spark.implicits._
    val t = mkDayTable()
    val full = scannedFiles(viaFormat(t))
    assert(full.size == 4, s"baseline: one file per day, got ${full.size}")

    // point predicate: one surviving file
    val eq = viaFormat(t).filter(col("day") === 2L)
    assert(scannedFiles(eq).size == 1,
      "day = 2 must plan exactly the day-2 file")
    assert(eq.as[(Long, Long, String)].collect().toSet ==
      SnapshotTable.read(spark, t).filter(col("day") === 2L)
        .as[(Long, Long, String)].collect().toSet, "row parity (point)")

    // range predicate: half the files
    val ge = viaFormat(t).filter(col("day") >= 2L)
    assert(scannedFiles(ge).size == 2, "day >= 2 plans the two upper files")
    assert(ge.count() == 100)

    // conjunction with a non-stats column: still prunes on the stats one
    val conj = viaFormat(t).filter(col("day") < 1L && col("k") % 2 === 0)
    assert(scannedFiles(conj).size == 1, "day < 1 plans only the day-0 file")
    assert(conj.count() == 25)

    // IN-list: hull pruning
    val in = viaFormat(t).filter(col("day").isin(0L, 3L))
    assert(scannedFiles(in).size == 4,
      "IN prunes by hull [0,3] — all four files intersect here")
    assert(in.count() == 100)

    // predicate provably outside EVERY envelope: zero files planned,
    // empty result with the right schema
    val none = viaFormat(t).filter(col("day") > 100L)
    assert(scannedFiles(none).isEmpty, "out-of-range: no file opened")
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "day", "v"))

    // a filter on a column WITHOUT envelopes prunes nothing (conservative)
    assert(scannedFiles(viaFormat(t).filter(col("k") === 5L)).size == 4,
      "no envelope on k: every file conservatively kept")
  }

  test("a TimestampType-clustered table prunes through the SQL door with floor-cast rounding") {
    import spark.implicits._
    val t = mkTable()
    // hour-clustered: 4 files, file d holds integer-second timestamps
    // [d*3600, d*3600+49]; statsCols = ts rides the AGGREGATE commit
    // path (cast-to-long = epoch-seconds, not footer micros)
    (0 to 3).foreach { d =>
      SnapshotTable.append(spark, t,
        (0 until 50).map(i => (d * 100L + i, d * 3600L + i, s"v$d-$i"))
          .toDF("k", "s", "v")
          .withColumn("ts", timestamp_seconds(col("s"))).drop("s")
          .select("k", "ts", "v").coalesce(1),
        statsCols = Seq("ts"))
    }
    assert(scannedFiles(viaFormat(t)).size == 4, "baseline: one file per hour")

    // point: ts = hour-2 start plans exactly the hour-2 file
    val eq = viaFormat(t).filter(col("ts") === timestamp_seconds(lit(7200L)))
    assert(scannedFiles(eq).size == 1, "ts = 02:00:00 plans one file")
    assert(eq.count() == 1)

    // range: second half
    val ge = viaFormat(t)
      .filter(col("ts") >= timestamp_seconds(lit(7200L)))
    assert(scannedFiles(ge).size == 2, "ts >= 02:00 plans the two upper files")
    assert(ge.count() == 100)

    // SUB-SECOND open bound: ts > 01:00:00.5 → lower envelope bound
    // floors to 3600, keeping the hour-1 file (envelope [3600,3649])
    // while still pruning hour 0; the residual filter trims the rows
    val sub = viaFormat(t)
      .filter(col("ts") > timestamp_seconds(lit(3600.5)))
    assert(scannedFiles(sub).size == 3,
      "ts > 01:00:00.5 prunes only the hour-0 file (floor rounding keeps hour 1)")
    assert(sub.count() == 149, "residual filter drops 01:00:00 itself")

    // open upper bound at an exact boundary: ts < 01:00:00 → upper
    // envelope bound is floorDiv(3600e6 - 1, 1e6) = 3599 → hour 0 only
    val lt = viaFormat(t).filter(col("ts") < timestamp_seconds(lit(3600L)))
    assert(scannedFiles(lt).size == 1, "ts < 01:00 plans only the hour-0 file")
    assert(lt.count() == 50)

    // provably outside every envelope: zero files planned
    val none = viaFormat(t)
      .filter(col("ts") > timestamp_seconds(lit(100 * 3600L)))
    assert(scannedFiles(none).isEmpty && none.count() == 0)

    // row parity with the Scala door on a box predicate
    val box = viaFormat(t).filter(
      col("ts") >= timestamp_seconds(lit(3600L)) &&
        col("ts") <= timestamp_seconds(lit(7249L)))
    assert(scannedFiles(box).size == 2)
    assert(box.select("k").as[Long].collect().toSet ==
      SnapshotTable.read(spark, t).filter(
        col("ts") >= timestamp_seconds(lit(3600L)) &&
          col("ts") <= timestamp_seconds(lit(7249L)))
        .select("k").as[Long].collect().toSet, "row parity (timestamp box)")
  }

  test("merge-on-read reads prune files the same way (deletes only remove rows)") {
    import spark.implicits._
    val t = mkDayTable()
    SnapshotTable.deleteWhere(spark, t, Seq(205L, 1L).toDF("k")) // live deletes
    val full = viaFormat(t)
    assert(full.count() == 198, "MoR steady state")
    val pruned = viaFormat(t).filter(col("day") === 2L)
    assert(scannedFiles(pruned).size == 1,
      s"MoR + envelope skip: only the day-2 file plans")
    assert(pruned.as[(Long, Long, String)].collect().toSet ==
      SnapshotTable.read(spark, t).filter(col("day") === 2L)
        .as[(Long, Long, String)].collect().toSet,
      "parity with the Scala door under deletes (k=205 gone)")
    assert(!pruned.as[(Long, Long, String)].collect().exists(_._1 == 205L))
  }

  test("the micro-batch stream prunes each diff against the pushed filters' envelopes") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference,
      EqualTo, Literal}
    import org.apache.spark.sql.types.LongType
    val t = mkDayTable()
    // drive the DSv2 handshake by hand so the PLANNED diff is observable
    val provider = new graft.sources.GraftSnapshotSource
    val props = java.util.Map.of("path", t)
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(props)
    val schema = provider.inferSchema(opts)
    val table = provider.getTable(schema, Array.empty,
      new java.util.HashMap(props))
    val sb = table.asInstanceOf[
      org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(opts)
    val day = AttributeReference("day", LongType, nullable = true)()
    sb.asInstanceOf[org.apache.spark.sql.internal.connector
      .SupportsPushDownCatalystFilters]
      .pushFilters(Seq(EqualTo(day, Literal(2L))))
    val stream = sb.build().toMicroBatchStream(
      Files.createTempDirectory("snapprune-ckpt").toString)
    // bootstrap batch (0, current]: only the day-2 file may plan
    val parts = stream.planInputPartitions(
      stream.initialOffset(), stream.latestOffset())
    val files = parts.flatMap { p =>
      val m = p.getClass.getMethod("inner"); m.setAccessible(true)
      m.invoke(p).asInstanceOf[FilePartition].files.map(_.filePath.toString)
    }
    assert(files.length == 1 && files.head.contains("data-00003"),
      s"stream diff pruned to the day-2 file (append #3): ${files.toSeq}")
    // end-to-end: the filtered stream still delivers exactly day 2
    val got = new scala.collection.mutable.ArrayBuffer[(Long, Long, String)]()
    val q = spark.readStream.format("graft-snapshot").load(t)
      .filter(col("day") === 2L)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("snapprune-ckpt2").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        got.synchronized { got ++= df.as[(Long, Long, String)].collect() }; ()
      }
      .start()
    q.processAllAvailable()
    // a new out-of-envelope append plans an EMPTY batch, an in-envelope
    // one streams through
    SnapshotTable.append(spark, t,
      Seq((900L, 9L, "late9")).toDF("k", "day", "v"), statsCols = Seq("day"))
    SnapshotTable.append(spark, t,
      Seq((901L, 2L, "late2")).toDF("k", "day", "v"), statsCols = Seq("day"))
    q.processAllAvailable()
    q.stop()
    assert(got.size == 51 && got.count(_._2 == 2L) == 51 &&
      got.exists(_._3 == "late2"),
      s"filtered stream delivers exactly day 2 (incl. the late append): ${got.size}")
  }
}
