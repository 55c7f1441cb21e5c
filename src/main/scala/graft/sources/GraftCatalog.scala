package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException,
  NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  StagedTable, StagingTableCatalog, SupportsNamespaces, SupportsWrite, Table,
  TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write,
  WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{LongType, StructType}
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
  * spark.sql("INSERT INTO graft.events.clicks SELECT ...")
  * spark.table("graft.events.clicks")                 // DataFrame API
  * spark.sql("SHOW NAMESPACES IN graft")
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
  * DML: `INSERT INTO` / `INSERT OVERWRITE` work — catalog-loaded
  * tables advertise the V1 write fallback, which routes the whole
  * DataFrame into [[SnapshotTable.append]]/commit with the full claim
  * + ledger protocol ([[GraftV1WriteBuilder]]). DELETE/MERGE via SQL
  * and DDL (CREATE/ALTER/RENAME) still refuse loudly — those
  * mutations go through the Scala API, whose semantics (merge-on-read
  * deletes, scoped merges) SQL's generic plans cannot express here.
  * `DROP TABLE` REFUSES while live consumer pins exist (the one
  * destructive op that must respect the retention machinery vacuum
  * respects); `DROP TABLE ... PURGE` overrides. Namespaces are
  * directories: SHOW NAMESPACES / CREATE NAMESPACE / DROP NAMESPACE
  * work against the warehouse tree.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with StagingTableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {

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

  private def fsOf(path: String) = new org.apache.hadoop.fs.Path(path)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def tableExists(ident: Identifier): Boolean =
    SnapshotTable.currentVersion(spark, pathOf(ident)) > 0L

  private def load(ident: Identifier, extra: (String, String)*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    // __graft_insertable: catalog tables opt into SQL INSERT (the V1
    // write fallback through the commit protocol)
    val props = (Map("path" -> pathOf(ident),
      "__graft_insertable" -> "true") ++ extra).asJava
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

  /** DROP TABLE — refused while LIVE consumer pins exist: a drop under
    * a running streaming consumer would delete its replay window with
    * no warning, where vacuum would have refused. `DROP TABLE ...
    * PURGE` ([[purgeTable]]) is the explicit override.
    */
  override def dropTable(ident: Identifier): Boolean = {
    val p = pathOf(ident)
    if (!tableExists(ident)) return false
    val pins = SnapshotTable.pinnedVersions(spark, p)
    if (pins.nonEmpty) throw new IllegalStateException(
      s"$p has live consumer retention pins " +
        s"(${pins.keys.toSeq.sorted.mkString(", ")}) — a DROP would " +
        "destroy their replay windows. Stop the consumers (or " +
        "SnapshotTable.unpin them), or force with DROP TABLE ... PURGE")
    fsOf(p).delete(new org.apache.hadoop.fs.Path(p), true)
  }

  /** `DROP TABLE ... PURGE`: drop regardless of pins — the operator
    * explicitly chose to destroy consumer replay windows.
    */
  override def purgeTable(ident: Identifier): Boolean = {
    val p = pathOf(ident)
    tableExists(ident) &&
      fsOf(p).delete(new org.apache.hadoop.fs.Path(p), true)
  }

  /** Plain `CREATE TABLE` (no AS SELECT) still refuses, BY DESIGN: a
    * snapshot table's first commit must carry real data (the format
    * refuses empty snapshots), so a data-less CREATE could only stage
    * an empty directory that every read would then refuse anyway. CTAS
    * ([[stageCreate]]) and `df.write` are the creation doors — both
    * land version 1 with data through the claim protocol.
    */
  override def createTable(ident: Identifier,
                           schema: org.apache.spark.sql.types.StructType,
                           partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
                           properties: JMap[String, String]): Table =
    throw new UnsupportedOperationException(
      s"$catalogName: a snapshot table's first commit must carry data " +
        "(the format refuses empty snapshots) — use CREATE TABLE ... AS " +
        "SELECT, or df.write.format(\"graft-snapshot\").mode(\"append\")" +
        s".save(\"${pathOf(ident)}\")")

  // ---------------------------------------------------------------- //
  // CTAS / RTAS: the staged table's write IS the snapshot commit —    //
  // SnapshotTable.commit with the claim protocol, so "atomic" here is //
  // the format's own manifest-publication atomicity. A concurrent     //
  // rival CTAS loses at the claim (expectedBase), not by overwrite.   //
  // ---------------------------------------------------------------- //

  /** `statsCols` TBLPROPERTY (comma-separated column names): the stat
    * columns the CTAS commit records envelopes for, restricted to
    * long-castable columns the query actually produces. On REPLACE,
    * defaults to the stat columns the table already carries — an RTAS
    * must not silently disable the file pruning the table's readers
    * rely on.
    */
  private def statsColsFor(path: String, schema: StructType,
                           properties: JMap[String, String],
                           carryForward: Boolean): Seq[String] = {
    def usable(c: String): Boolean =
      schema.fields.exists(f => f.name.equalsIgnoreCase(c) &&
        org.apache.spark.sql.catalyst.expressions.Cast
          .canCast(f.dataType, LongType))
    val declared = properties.asScala.collectFirst {
      case (k, v) if k.equalsIgnoreCase("statscols") => v
    }.map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    declared match {
      case Some(cols) =>
        // an EXPLICITLY declared stat column the query cannot satisfy
        // is a mistake (a typo, a string column): silently dropping it
        // would mint a table with no envelopes and no error — every
        // read scans every file until someone notices. Refuse loudly,
        // the posture of everything else on this surface.
        val bad = cols.filterNot(usable)
        if (bad.nonEmpty) throw new IllegalArgumentException(
          s"$path: statsCols TBLPROPERTY names " +
            s"${bad.mkString("[", ", ", "]")}, which the query does not " +
            "produce as long-castable column(s) — stat envelopes cover " +
            s"long-castable columns only; query columns: " +
            schema.fields.map(f => s"${f.name}: ${f.dataType.simpleString}")
              .mkString(", "))
        cols
      case None =>
        // the carry-forward path filters SILENTLY by design: an RTAS
        // that narrows the schema legitimately sheds envelopes for the
        // columns it dropped
        if (carryForward) SnapshotTable.carriedStatsCols(spark, path, schema)
        else Nil
    }
  }

  private def requireUnpartitioned(partitions: Array[Transform]): Unit =
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      s"$catalogName tables do not take PARTITIONED BY — cluster with " +
        "a sorted/z-ordered write plus the statsCols TBLPROPERTY " +
        "(manifest envelope pruning), or Layout.writePartitioned for " +
        "directory layout")

  /** `CREATE TABLE ... AS SELECT`: lands version 1 through
    * [[SnapshotTable.commit]] with `expectedBase = 0` — of two racing
    * CTAS, exactly one wins the claim; the loser fails with
    * [[ConcurrentCommitException]] and commits nothing.
    */
  override def stageCreate(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): StagedTable = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    requireUnpartitioned(partitions)
    val p = pathOf(ident)
    new GraftStagedTable(p, ident.toString, schema,
      statsColsFor(p, schema, properties, carryForward = false),
      expectedBase = Some(0L), op = "append", createDir = true)
  }

  /** `REPLACE TABLE ... AS SELECT`: a whole-snapshot replace committed
    * against the version observed at stage time — a rival commit in
    * between refuses rather than silently clobbering it. Old versions
    * stay readable (time travel, retention, pins all unchanged).
    */
  override def stageReplace(ident: Identifier, schema: StructType,
                            partitions: Array[Transform],
                            properties: JMap[String, String]): StagedTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    requireUnpartitioned(partitions)
    val p = pathOf(ident)
    new GraftStagedTable(p, ident.toString, schema,
      statsColsFor(p, schema, properties, carryForward = true),
      expectedBase = Some(SnapshotTable.currentVersion(spark, p)),
      op = "replace", createDir = false)
  }

  /** `CREATE OR REPLACE TABLE ... AS SELECT`: replace-or-create
    * against the stage-time version (0 on a fresh path — where this
    * is exactly [[stageCreate]]).
    */
  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
                                    partitions: Array[Transform],
                                    properties: JMap[String, String])
      : StagedTable = {
    requireUnpartitioned(partitions)
    val p = pathOf(ident)
    val base = SnapshotTable.currentVersion(spark, p)
    new GraftStagedTable(p, ident.toString, schema,
      statsColsFor(p, schema, properties, carryForward = base > 0L),
      expectedBase = Some(base),
      op = if (base > 0L) "replace" else "append", createDir = base == 0L)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$catalogName does not support ALTER TABLE: schema evolution is " +
        "commit-time (append a batch with the evolved schema)")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName does not support RENAME TABLE: a rename would break " +
        "consumers pinned to the old path (pins, checkpoints)")

  // ---------------------------------------------------------------- //
  // Maintenance procedures: CALL graft.system.<op>(table => 'ns.t')  //
  // — thin SQL veneers over the SnapshotTable ops (GraftProcedures). //
  // ---------------------------------------------------------------- //

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (!ident.namespace().sameElements(Array(GraftProcedures.Namespace)))
      throw unknownProcedure(ident)
    GraftProcedures.load(warehouse, ident.name())
      .getOrElse(throw unknownProcedure(ident))
  }

  private def unknownProcedure(ident: Identifier) =
    new UnsupportedOperationException(
      s"$catalogName has no procedure $ident — available: " +
        GraftProcedures.names.map(n => s"$catalogName.system.$n")
          .mkString(", "))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty ||
        namespace.sameElements(Array(GraftProcedures.Namespace)))
      GraftProcedures.names
        .map(n => Identifier.of(Array(GraftProcedures.Namespace), n)).toArray
    else Array.empty

  // ---------------------------------------------------------------- //
  // Namespaces: directories under the warehouse. A directory that     //
  // holds a committed snapshot is a TABLE; anything else is browsable //
  // namespace space. CREATE NAMESPACE = mkdir.                        //
  // ---------------------------------------------------------------- //

  private def nsPath(namespace: Array[String]) =
    new org.apache.hadoop.fs.Path((warehouse +: namespace).mkString("/"))

  private def isTableDir(path: org.apache.hadoop.fs.Path): Boolean =
    SnapshotTable.currentVersion(spark, path.toString) > 0L

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = nsPath(namespace)
    val f = fsOf(p.toString)
    namespace.nonEmpty && f.exists(p) && f.getFileStatus(p).isDirectory &&
      !isTableDir(p)
  }

  override def listNamespaces(): Array[Array[String]] = {
    val root = nsPath(Array.empty)
    val f = fsOf(root.toString)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).filter(_.isDirectory)
      .filterNot(s => isTableDir(s.getPath))
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    val f = fsOf(nsPath(namespace).toString)
    f.listStatus(nsPath(namespace)).filter(_.isDirectory)
      .filterNot(s => isTableDir(s.getPath))
      .map(s => namespace :+ s.getPath.getName)
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(
      catalogName +: namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(catalogName +: namespace)
    fsOf(nsPath(namespace).toString).mkdirs(nsPath(namespace))
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"$catalogName namespaces carry no metadata to alter")

  /** DROP NAMESPACE: empty-only without CASCADE; with CASCADE, refuse
    * while ANY contained table holds live pins (the dropTable rule,
    * applied to the subtree).
    */
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val p = nsPath(namespace)
    val f = fsOf(p.toString)
    val children = f.listStatus(p)
    if (!cascade && children.nonEmpty) throw new IllegalStateException(
      s"namespace ${namespace.mkString(".")} is not empty — use CASCADE")
    if (cascade) {
      // the dropTable rule applied to the WHOLE subtree: tables can
      // live under nested namespaces, and a cascade that only checked
      // direct children would destroy a nested pinned table's replay
      // window without refusal
      def pinnedUnder(dir: org.apache.hadoop.fs.Path)
          : Seq[org.apache.hadoop.fs.Path] =
        f.listStatus(dir).filter(_.isDirectory).map(_.getPath).toSeq
          .flatMap { d =>
            if (isTableDir(d)) {
              if (SnapshotTable.pinnedVersions(spark, d.toString).nonEmpty)
                Seq(d)
              else Nil
            } else pinnedUnder(d)
          }
      val pinnedTables = pinnedUnder(p)
      if (pinnedTables.nonEmpty) throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} holds tables with live " +
          s"consumer pins (${pinnedTables.map(_.getName).mkString(", ")}) " +
          "— stop the consumers or drop the tables with PURGE first")
    }
    f.delete(p, true)
  }
}

/** The CTAS/RTAS staging veneer: a write-only [[StagedTable]] whose V1
  * write runs [[SnapshotTable.commit]] against `expectedBase` — the
  * manifest publication is the real commit point, so
  * [[commitStagedChanges]] has nothing left to do and
  * [[abortStagedChanges]] only sweeps a still-EMPTY directory tree a
  * failed CREATE may have left. The sweep is non-recursive,
  * bottom-up, empty-dirs-only: `delete(dir, recursive = false)` fails
  * on a non-empty directory, so a rival writer racing onto the same
  * path (a concurrent path-door commit mid-stage) keeps every file it
  * has staged or committed — the guarantee "abort never deletes a
  * committed snapshot, or anyone's data" holds ATOMICALLY at the
  * filesystem, not via a check-then-delete window. A write failure
  * before the manifest landed is already cleaned by the claim
  * machinery (withClaim releases the claim and its staged artifacts).
  */
private class GraftStagedTable(path: String, tableName: String,
    pinnedSchema: StructType, statsCols: Seq[String],
    expectedBase: Option[Long], op: String, createDir: Boolean)
    extends Table with SupportsWrite with StagedTable {

  @volatile private var committed = 0L

  override def name(): String = tableName
  override def schema(): StructType = pinnedSchema
  override def partitioning(): Array[Transform] = Array.empty
  // TRUNCATE is advertised because RTAS plans as OverwriteByExpression
  // (truncate-then-write); the "truncate" is vacuous here — the commit
  // is a whole-snapshot replace regardless, against expectedBase
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              committed = SnapshotTable.commit(data.sparkSession, path, data,
                statsCols = statsCols, expectedBase = expectedBase, op = op)
            }
          }
      }
    }

  override def commitStagedChanges(): Unit = ()

  override def abortStagedChanges(): Unit = {
    val spark = SparkSession.active
    if (committed == 0L && createDir) {
      val p = new org.apache.hadoop.fs.Path(path)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // post-order: child dirs first, so an all-empty tree collapses;
      // any FILE anywhere (a rival's claim, data, manifest) makes the
      // non-recursive deletes fail from that level up — exactly right.
      // Best-effort throughout: local fs THROWS (not false) on a
      // non-empty non-recursive delete, and a rival racing in between
      // the emptiness check and the delete must surface as "sweep
      // stops", never as an exception masking the query's own failure
      def sweepEmpty(dir: org.apache.hadoop.fs.Path): Unit =
        try {
          val children = f.listStatus(dir)
          children.filter(_.isDirectory).foreach(c => sweepEmpty(c.getPath))
          if (f.listStatus(dir).isEmpty) f.delete(dir, false)
        } catch { case _: java.io.IOException => () }
      if (f.exists(p)) sweepEmpty(p)
    }
  }
}
