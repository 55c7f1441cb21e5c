package graft.sources

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** MARKER table for a merge-on-read snapshot whose certified delete
  * backlog exceeds the DSv2 per-task key-set ceiling: the scan-side
  * representation (boxed keys shipped with reader factories) would
  * risk an executor OOM, and a Scan cannot plan the shuffle the
  * subtraction needs at that size. Resolution instead happens a level
  * up: [[GraftMorFallbackRule]] (registered via
  * [[GraftSnapshotExtensions]]) replaces this relation during analysis
  * with the Scala door's plan — [[SnapshotTable.read]]'s anti-join,
  * which hash-partitions past its own broadcast cap. In a session
  * WITHOUT the extension, building a scan fails loudly with every
  * remedy named (never an executor OOM).
  */
private[sources] class GraftMorFallbackTable(tableName: String,
    val root: String, val snapshotVersion: Long, tableSchema: StructType,
    backlog: Long, cap: Long, insertable: Boolean = false)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with GraftSqlDelete {
  protected def deleteRoot: String = root
  protected def deleteSchema: StructType = tableSchema
  protected def dmlEnabled: Boolean = insertable
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] = Array.empty
  // writes don't read: a catalog INSERT/DELETE must keep working when
  // the backlog crosses the read ceiling (appends land at a higher
  // sequence number; a DELETE only grows the backlog compaction will
  // purge) — losing DML exactly when the table most needs maintenance
  // commits would be backwards
  override def capabilities(): java.util.Set[TableCapability] =
    if (insertable)
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ,
        TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)
    else
      java.util.EnumSet.of(TableCapability.BATCH_READ,
        TableCapability.MICRO_BATCH_READ)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(insertable, s"$root is not writable through this surface")
    new GraftV1WriteBuilder(root, info)
  }
  private def refusal = new UnsupportedOperationException(
    s"$root v$snapshotVersion: $backlog outstanding delete-key rows exceed " +
      s"the DSv2 merge-on-read ceiling $cap " +
      "(min of deleteBroadcastMaxRows and deleteSpecMaxRows). " +
      "Remedies: register graft.sources.GraftSnapshotExtensions " +
      "(spark.sql.extensions) so this read plans as a shuffled " +
      "anti-join; or compact the table (SnapshotTable.compactScoped/" +
      "compactSnapshot purges deletes physically); or read via " +
      "SnapshotTable.read, whose anti-join shuffles instead")

  /** The refusal fires when the scan would actually PRODUCE data
    * (toBatch / the stream), not at scan construction: the optimizer
    * builds scans for relations that never execute — a `DELETE FROM`'s
    * target relation, for one — and a construction-time throw would
    * take working DML down with the unreadable read.
    */
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): org.apache.spark.sql.connector.read.Scan =
        new org.apache.spark.sql.connector.read.Scan {
          override def readSchema(): StructType = tableSchema
          override def description(): String =
            s"GraftMorFallbackScan (refuses at execution) $root"
          override def toBatch
              : org.apache.spark.sql.connector.read.Batch = throw refusal
          override def toMicroBatchStream(checkpointLocation: String)
              : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
            throw refusal
        }
    }
}

/** Rewrites a [[GraftMorFallbackTable]] relation into the Scala door's
  * read plan: data files minus the equality-delete backlog as a
  * sequence-number-bounded anti-join — BROADCAST under
  * [[SnapshotTable.deleteBroadcastMaxRows]], hash-partitioned SHUFFLE
  * past it. The rewrite happens at post-hoc resolution, BEFORE the
  * optimizer's scan pushdown, so the marker's refusing scan builder is
  * never consulted; column/filter pushdown then applies to the
  * underlying parquet relations like any other plan. Output attribute
  * ids are preserved via an aliasing projection, so references above
  * the relation stay valid.
  */
private[sources] class GraftMorFallbackRule(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftMorFallbackTable] =>
        val t = r.table.asInstanceOf[GraftMorFallbackTable]
        val child =
          SnapshotTable.read(session, t.root, t.snapshotVersion).queryExecution.analyzed
        val byName = child.output.map(a => a.name.toLowerCase -> a).toMap
        Project(r.output.map { o =>
          Alias(byName(o.name.toLowerCase), o.name)(exprId = o.exprId)
        }, child)
    }
}

/** Session extension completing the snapshot connector's SQL story
  * past the merge-on-read ceiling:
  * `--conf spark.sql.extensions=graft.sources.GraftSnapshotExtensions`
  * (also wired into graft.functions.GraftExactExtensions). Bit-exact:
  * the injected rule only ever replaces a relation that would
  * otherwise REFUSE, with a plan producing identical rows.
  */
class GraftSnapshotExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectPostHocResolutionRule(s => new GraftMorFallbackRule(s))
}
