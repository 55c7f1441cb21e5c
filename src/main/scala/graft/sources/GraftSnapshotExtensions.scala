package graft.sources

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Alias, KnownNotNull}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable,
  LogicalPlan, MergeIntoTable, Project, UpdateTable, V2WriteCommand}
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
  // the extension remedy is BATCH-only: the fallback rule rewrites
  // DataSourceV2Relation, and a readStream's StreamingRelationV2 never
  // matches it — advertising it to a stream would send the user to a
  // remedy that cannot work (compaction purges the backlog for BOTH)
  private def refusal(streaming: Boolean) = new UnsupportedOperationException(
    s"$root v$snapshotVersion: $backlog outstanding delete-key rows exceed " +
      s"the DSv2 merge-on-read ceiling $cap " +
      "(min of deleteBroadcastMaxRows and deleteSpecMaxRows). Remedies: " +
      (if (streaming) ""
       else "register graft.sources.GraftSnapshotExtensions " +
         "(spark.sql.extensions) so this batch read plans as a shuffled " +
         "anti-join; or ") +
      "compact the table (SnapshotTable.compactScoped/" +
      "compactSnapshot purges deletes physically); or read via " +
      "SnapshotTable.read, whose anti-join shuffles instead" +
      (if (streaming) " (the GraftSnapshotExtensions rewrite covers " +
        "BATCH reads only — a stream past the ceiling needs compaction)"
       else ""))

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
              : org.apache.spark.sql.connector.read.Batch =
            throw refusal(streaming = false)
          override def toMicroBatchStream(checkpointLocation: String)
              : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
            throw refusal(streaming = true)
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

  /** Command TARGETS are not reads. `DeleteFromTable` (and the other
    * row-level commands) hold the target relation as a plan child, and
    * a blanket bottom-up rewrite would hand the command a `Project`
    * where it expects a table relation — `[INTERNAL_ERROR] Unexpected
    * table relation` — taking DML down exactly when a past-the-ceiling
    * table most needs maintenance commits ("writes don't read"). So
    * the rule dispatches at the ROOT: command targets pass through
    * untouched; genuine read sides (a MERGE source, an INSERT's
    * query) still rewrite.
    */
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable => d
    case u: UpdateTable => u
    case m: MergeIntoTable => m.copy(sourceTable = rewriteReads(m.sourceTable))
    case w: V2WriteCommand => w.withNewQuery(rewriteReads(w.query))
    case other => rewriteReads(other)
  }

  private def rewriteReads(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftMorFallbackTable] =>
        val t = r.table.asInstanceOf[GraftMorFallbackTable]
        val child =
          SnapshotTable.read(session, t.root, t.snapshotVersion).queryExecution.analyzed
        val byName = child.output.map(a => a.name.toLowerCase -> a).toMap
        Project(r.output.map { o =>
          val base = byName(o.name.toLowerCase)
          // the Scala door reads parquet (everything nullable); where
          // the committed schema declares NON-null, restore the marker
          // relation's nullability — an INSERT INTO ... SELECT over
          // this rewrite otherwise fails AppendData's output
          // compatibility check (nullable query column into a non-null
          // table column) as an unresolved-operator internal error
          val expr = if (!o.nullable && base.nullable) KnownNotNull(base)
                     else base
          Alias(expr, o.name)(exprId = o.exprId)
        }, child)
    }
}

/** Session extension completing the snapshot connector's SQL story
  * past the merge-on-read ceiling AND for `MERGE INTO`:
  * `--conf spark.sql.extensions=graft.sources.GraftSnapshotExtensions`
  * (also wired into graft.functions.GraftExactExtensions). Bit-exact:
  * each injected rule only ever replaces a plan that would otherwise
  * REFUSE — the fallback rule with a read producing identical rows,
  * the merge rule ([[GraftSqlMergeRule]]) with the command that
  * executes the MERGE through the claim protocol.
  */
class GraftSnapshotExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // order matters: the MERGE rule must see the ORIGINAL relations
    // (its self-read identity check matches a past-the-ceiling source
    // before the fallback rule dissolves it into a Scala-door plan);
    // a legitimate past-ceiling source inside a translated merge still
    // rewrites later — the command re-analyzes its source plan in the
    // same session when it runs
    ext.injectPostHocResolutionRule(s => new GraftSqlMergeRule(s))
    ext.injectPostHocResolutionRule(s => new GraftMorFallbackRule(s))
  }
}
