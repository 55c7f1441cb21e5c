package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A Spark SQL CATALOG over a warehouse of snapshot tables — the
  * NAMED-table door, completing the SQL-first story the path-based
  * format door opened:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft",
  *   "graft.sources.GraftCatalog")
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/data")
  *
  * spark.sql("SELECT * FROM graft.events.clicks")
  * spark.sql("SELECT * FROM graft.events.clicks VERSION AS OF 3")
  * spark.sql("SELECT * FROM graft.events.clicks TIMESTAMP AS OF '...'")
  * spark.table("graft.events.clicks")                 // DataFrame API
  * }}}
  *
  * An identifier maps to `warehouse/<namespace.../name>`; a table
  * EXISTS when that directory holds a committed snapshot. Resolution
  * reuses [[GraftSnapshotSource]] wholesale (one pinned resolution per
  * load, merge-on-read when equality deletes are live, the read-only
  * veneer that keeps raw parquet writes out), so the catalog adds
  * NAMING, not a second read path. SQL time travel maps onto the
  * format's own: `VERSION AS OF` → `versionAsOf`, `TIMESTAMP AS OF` →
  * [[SnapshotTable.versionAt]] over the `#ts` manifest headers.
  *
  * Deliberately READ-focused: DDL (CREATE/ALTER/RENAME) and SQL DML
  * refuse loudly — mutations go through `df.write.format(
  * "graft-snapshot")` or the Scala API, the doors that carry the
  * claim + ledger commit protocol. `DROP TABLE` works (it is a
  * catalog-level operation with clear semantics: the table's
  * directory is removed).
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def pathOf(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name())).mkString("/")

  private def spark = SparkSession.active

  override def tableExists(ident: Identifier): Boolean =
    SnapshotTable.currentVersion(spark, pathOf(ident)) > 0L

  private def load(ident: Identifier, extra: (String, String)*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val props = (Map("path" -> pathOf(ident)) ++ extra).asJava
    val provider = new GraftSnapshotSource
    val schema = provider.inferSchema(new CaseInsensitiveStringMap(props))
    provider.getTable(schema, Array.empty,
      new java.util.HashMap[String, String](props))
  }

  override def loadTable(ident: Identifier): Table = load(ident)

  /** SQL `VERSION AS OF v`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, "versionAsOf" -> version)

  /** SQL `TIMESTAMP AS OF ts` — Spark hands MICROseconds since epoch;
    * the format's headers are millis.
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    load(ident, "timestampAsOf" -> (timestampMicros / 1000L).toString)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new org.apache.hadoop.fs.Path(
      (warehouse +: namespace).mkString("/"))
    val f = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => SnapshotTable.currentVersion(
        spark, (warehouse +: namespace :+ n).mkString("/")) > 0L)
      .map(n => Identifier.of(namespace, n))
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new org.apache.hadoop.fs.Path(pathOf(ident))
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    tableExists(ident) && f.delete(p, true)
  }

  override def createTable(ident: Identifier,
                           schema: org.apache.spark.sql.types.StructType,
                           partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
                           properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException(
      s"$catalogName is read-focused: create tables by WRITING to them — " +
        "df.write.format(\"graft-snapshot\").mode(\"append\")" +
        s".save(\"${pathOf(ident)}\") — so the first commit carries real " +
        "data and a real schema through the claim protocol")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$catalogName does not support ALTER TABLE: schema evolution is " +
        "commit-time (append a batch with the evolved schema)")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName does not support RENAME TABLE: a rename would break " +
        "consumers pinned to the old path (pins, checkpoints)")
}
