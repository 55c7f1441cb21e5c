package graft.sources

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** The catalog's MAINTENANCE surface through SQL `CALL` — the ops a
  * SQL-first operator otherwise has to leave SQL for:
  *
  * {{{
  * CALL graft.system.compact(table => 'ns.t')
  * CALL graft.system.compact_scoped(table => 'ns.t', scope_col => 'day')
  * CALL graft.system.vacuum(table => 'ns.t', retain => 3)
  * CALL graft.system.rewrite_manifests(table => 'ns.t', group_size => 64)
  * CALL graft.system.release_stale_claims(table => 'ns.t',
  *                                        older_than_ms => 3600000)
  * CALL graft.system.unpin(table => 'ns.t', consumer_id => '...')
  * CALL graft.system.history(table => 'ns.t')   -- versions/ops/rows
  * CALL graft.system.pins(table => 'ns.t')      -- live consumer pins
  * }}}
  *
  * Each procedure is a thin SQL veneer over the corresponding
  * [[SnapshotTable]] op — the semantics, refusals (vacuum respecting
  * pins, compaction losing races instead of data), and commit
  * protocol are THEIRS, unchanged; the veneer only resolves the
  * dotted table name against the catalog's warehouse and returns the
  * op's result as a one-row result set. Spark's `InvokeProcedures`
  * runs `call` eagerly and surfaces the returned [[LocalScan]] rows
  * as the CALL result.
  */
private[sources] object GraftProcedures {

  /** The procedure namespace under the catalog: `graft.system.<op>`. */
  val Namespace = "system"

  private def p(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def pd(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** Resolve the dotted table argument against the warehouse, refusing
    * path-escape segments: the CALL door must not be MORE permissive
    * than the identifier door (`vacuum(table => '../../prod/t')` would
    * otherwise run destructive maintenance outside the warehouse the
    * catalog was scoped to).
    */
  private def resolvePath(warehouse: String, proc: String,
                          table: String): String = {
    val parts = table.split('.').toSeq
    val bad = parts.filter(s => s.isEmpty || s == "." || s == ".." ||
      s.contains("/") || s.contains("\\"))
    require(bad.isEmpty,
      s"$proc: table '$table' contains path-escape segment(s) " +
        s"${bad.mkString("[", ", ", "]")} — use a plain dotted " +
        "namespace.table identifier")
    (warehouse +: parts).mkString("/")
  }

  /** One maintenance procedure: parameters, a result column, and the
    * [[SnapshotTable]] op to run. `args` arrive coerced to the
    * declared parameter types, in declaration order (defaults filled
    * by Spark's named-argument resolution).
    */
  private final class Maintenance(warehouse: String, procName: String,
      params: Array[ProcedureParameter], resultCol: String,
      op: (SparkSession, String, InternalRow) => Long,
      // release_stale_claims exists precisely for a table WEDGED at
      // version 0 by a crashed first commit's claim — requiring a
      // committed snapshot would block it in the one state it fixes;
      // it requires the directory instead
      requiresSnapshot: Boolean = true)
      extends UnboundProcedure with BoundProcedure {

    override def name(): String = procName
    override def description(): String =
      s"graft maintenance: $procName (see SnapshotTable.$procName)"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // it commits

    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val table = input.getUTF8String(0).toString
      val path = resolvePath(warehouse, procName, table)
      if (requiresSnapshot)
        require(SnapshotTable.currentVersion(spark, path) > 0L,
          s"$procName: no committed snapshot at $path (from '$table')")
      else {
        val hp = new org.apache.hadoop.fs.Path(path)
        require(hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(hp), s"$procName: no table directory at $path")
      }
      val result = op(spark, path, input)
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType =
          StructType(Seq(StructField(resultCol, LongType, nullable = false)))
        override def rows(): Array[InternalRow] =
          Array(new GenericInternalRow(Array[Any](result)))
        override def description(): String = s"graft.$procName result"
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  /** A read-only INSPECTION procedure: no commit, a multi-row result
    * set (the CALL surface doubles as the SQL door to the operational
    * metadata the Scala side exposes as frames/case classes).
    */
  private final class Inspection(warehouse: String, procName: String,
      resultSchema: StructType,
      rowsOf: (SparkSession, String) => Array[InternalRow])
      extends UnboundProcedure with BoundProcedure {

    override def name(): String = procName
    override def description(): String = s"graft inspection: $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] =
      Array(p("table", StringType))
    override def isDeterministic: Boolean = false // reads current state

    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val table = input.getUTF8String(0).toString
      val path = resolvePath(warehouse, procName, table)
      require(SnapshotTable.currentVersion(spark, path) > 0L,
        s"$procName: no committed snapshot at $path (from '$table')")
      val out = rowsOf(spark, path)
      val scan: Scan = new LocalScan {
        override def readSchema(): StructType = resultSchema
        override def rows(): Array[InternalRow] = out
        override def description(): String = s"graft.$procName result"
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  private def utf8(s: String) =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  /** All procedures, keyed by name, bound to one warehouse. */
  def load(warehouse: String, name: String): Option[UnboundProcedure] = {
    def m(params: Array[ProcedureParameter], resultCol: String)(
        op: (SparkSession, String, InternalRow) => Long): UnboundProcedure =
      new Maintenance(warehouse, name, params, resultCol, op)
    name match {
      case "compact" => Some(m(Array(
        p("table", StringType),
        pd("target_bytes", LongType, (128L << 20).toString)), "version") {
        (s, t, in) => SnapshotTable.compactSnapshot(s, t, in.getLong(1))
      })
      case "compact_scoped" => Some(m(Array(
        p("table", StringType),
        p("scope_col", StringType),
        pd("max_files_per_scope", IntegerType, "4")), "version") {
        (s, t, in) =>
          val scope = in.getUTF8String(1).toString
          // carry EVERY existing stat column through the rewrite, not
          // just the scope column — the Scala default would silently
          // narrow the table's envelope coverage
          val stats = (SnapshotTable.statsColsOf(s, t)
            .filterNot(_.equalsIgnoreCase(scope)) :+ scope)
          SnapshotTable.compactScoped(s, t, scope, in.getInt(2), stats)
      })
      case "vacuum" => Some(m(Array(
        p("table", StringType),
        pd("retain", IntegerType, "1"),
        pd("retain_for_ms", LongType, "0"),
        pd("pin_max_age_ms", LongType, (7L * 24 * 3600 * 1000).toString)),
        "removed") {
        (s, t, in) => SnapshotTable.vacuum(s, t, in.getInt(1), in.getLong(2),
          in.getLong(3))
      })
      case "rewrite_manifests" => Some(m(Array(
        p("table", StringType),
        pd("group_size", IntegerType, "64")), "version") {
        (s, t, in) => SnapshotTable.rewriteManifests(s, t, in.getInt(1))
      })
      case "release_stale_claims" => Some(new Maintenance(warehouse, name,
        Array(p("table", StringType), p("older_than_ms", LongType)),
        "released",
        (s, t, in) => SnapshotTable.releaseStaleClaims(s, t, in.getLong(1)),
        requiresSnapshot = false))
      case "unpin" => Some(m(Array(
        p("table", StringType),
        p("consumer_id", StringType)), "remaining_pins") {
        (s, t, in) =>
          val id = in.getUTF8String(1).toString
          // `pin-…` values straight out of CALL pins release that file;
          // a consumer id that happens to start with `pin-` still
          // resolves through the hash as a fallback. Removing NOTHING
          // refuses loudly — a silently "successful" unpin of a typo'd
          // name would leave the pin holding vacuum's floor forever
          val removed =
            (id.startsWith("pin-") && !id.contains("/") &&
              !id.contains("\\") && SnapshotTable.unpinByName(s, t, id)) ||
            SnapshotTable.unpin(s, t, id)
          require(removed, s"unpin: no pin file or consumer id '$id' on " +
            s"$t — CALL pins lists the live pin names")
          SnapshotTable.pinnedVersions(s, t).size.toLong
      })
      case "history" => Some(new Inspection(warehouse, name,
        StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("timestamp_ms", LongType, nullable = true),
          StructField("op", StringType, nullable = true),
          StructField("files", LongType, nullable = false),
          StructField("delete_files", LongType, nullable = false),
          StructField("rows", LongType, nullable = true))),
        (s, t) => SnapshotTable.history(s, t).map { i =>
          new GenericInternalRow(Array[Any](i.version,
            i.timestampMs.map(Long.box).orNull,
            i.op.map(utf8).orNull, i.files, i.deleteFiles,
            i.rows.map(Long.box).orNull))
        }.toArray))
      case "pins" => Some(new Inspection(warehouse, name,
        // `pin` is the FILE name (hashed, not the raw consumer id) —
        // exactly what CALL unpin accepts back
        StructType(Seq(
          StructField("pin", StringType, nullable = false),
          StructField("version", LongType, nullable = false))),
        (s, t) => SnapshotTable.pinnedVersions(s, t).toSeq.sortBy(_._1)
          .map { case (c, v) =>
            new GenericInternalRow(Array[Any](utf8(c), v))
          }.toArray))
      case _ => None
    }
  }

  val names: Seq[String] = Seq("compact", "compact_scoped", "vacuum",
    "rewrite_manifests", "release_stale_claims", "unpin", "history", "pins")
}
