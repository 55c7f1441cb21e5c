package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 READ connector for [[SnapshotTable]] — the SQL-first
  * door into the snapshot format:
  *
  * {{{
  * spark.read.format("graft-snapshot").load("/data/events")
  * spark.read.format("graft-snapshot")
  *   .option("versionAsOf", 3).load("/data/events")   // time travel
  * }}}
  *
  * Resolution delegates entirely to the format's own rules and then
  * hands Spark's BUILT-IN parquet v2 table the exact committed file
  * list: the snapshot's manifest supplies the FILE SET (no directory
  * listing of the data tree — uncommitted, orphaned and superseded
  * files are invisible) and the SCHEMA (the `#schema` header, so the
  * footer lottery can never pick the columns). Everything downstream —
  * vectorized parquet readers, predicate pushdown, column pruning,
  * partition coalescing — is the stock ParquetScan, which is the point:
  * the connector adds table resolution, not a read path.
  *
  * Tables carrying live EQUALITY DELETES ([[SnapshotTable.deleteWhere]])
  * are refused loudly: merge-on-read needs the anti-join that
  * [[SnapshotTable.read]] plans, which a bare file scan cannot express.
  * Run a compaction (which purges deletes physically) or read through
  * the Scala API. A delete-free table — the steady state between
  * deletes and their next scheduled compaction — reads identically
  * through both doors (spec-pinned parity).
  */
class GraftSnapshotSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-snapshot"

  private def tableRoot(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path"))
    require(p.nonEmpty && p.get.nonEmpty,
      "graft-snapshot needs the table root: .load(<path>) or .option(\"path\", ...)")
    p.get
  }

  private def resolve(options: CaseInsensitiveStringMap)
      : (String, Long, Seq[String], Option[StructType]) = {
    val spark = SparkSession.active
    val root = tableRoot(options)
    val version = Option(options.get("versionAsOf")).map(_.toLong).getOrElse(0L)
    val cur = SnapshotTable.currentVersion(spark, root)
    require(cur > 0L, s"$root has no committed snapshot")
    val v = if (version > 0L) version else cur
    val deletes = SnapshotTable.deleteFiles(spark, root, v)
    if (deletes.nonEmpty) throw new UnsupportedOperationException(
      s"$root v$v carries ${deletes.size} live equality-delete file(s): " +
        "merge-on-read needs SnapshotTable.read's anti-join, which a bare " +
        "file scan cannot express — compact the table (purges deletes " +
        "physically) or read through graft.sources.SnapshotTable.read")
    val files = SnapshotTable.snapshotFiles(spark, root, v)
      .map(rel => s"$root/$rel")
    (root, v, files, SnapshotTable.snapshotSchema(spark, root, v))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (_, _, files, schema) = resolve(options)
    // pre-#schema-header manifests (none written since r11) fall back
    // to footer inference over the committed file list
    schema.getOrElse(SparkSession.active.read.parquet(files: _*).schema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (root, v, files, _) = resolve(options)
    ParquetTable(s"graft-snapshot $root@v$v", SparkSession.active, options,
      files, Some(schema), classOf[ParquetFileFormat])
  }

  override def supportsExternalMetadata(): Boolean = false
}
