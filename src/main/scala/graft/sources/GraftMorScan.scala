package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** One equality-delete resolved for executor-side filtering: a data
  * row whose file's sequence number is below `appliesBelow` dies when
  * its `cols` projection (internal values, null-safe) is in `keys`.
  * The key set ships WITH the reader factory (task broadcast) — sized
  * by the manifest-certified backlog before the plan is built, so an
  * oversized backlog fails loudly at planning, never as an executor
  * OOM.
  */
private[sources] case class GraftDeleteSpec(cols: Seq[String],
                                            appliesBelow: Long,
                                            keys: Set[Seq[Any]])

private[sources] object GraftDeleteSpec {
  /** Resolve equality-delete key files to executor-shippable specs:
    * key columns CAST to the table's column types (the anti-join the
    * Scala reader plans would insert the same casts), key rows
    * collected driver-side. The manifest-certified backlog is
    * size-checked FIRST — the keys ship with reader factories (task
    * broadcast) in a boxed per-key representation heavier than the
    * compact broadcast relation [[SnapshotTable.applyDeletes]] builds,
    * so the ceiling is the LOWER of the two knobs; an oversized
    * backlog fails at planning with the remedies named, never as a
    * driver or executor OOM.
    */
  def resolve(spark: SparkSession, root: String, version: Long,
              schema: StructType,
              infos: Seq[SnapshotTable.DeleteFileInfo]): Seq[GraftDeleteSpec] = {
    import org.apache.spark.sql.functions.col
    if (infos.isEmpty) return Nil
    val backlog = infos.map(_.rows).sum
    val cap = math.min(SnapshotTable.deleteBroadcastMaxRows,
      SnapshotTable.deleteSpecMaxRows)
    if (backlog > cap)
      throw new UnsupportedOperationException(
        s"$root v$version: $backlog outstanding delete-key rows exceed " +
          s"the DSv2 merge-on-read ceiling $cap " +
          "(min of deleteBroadcastMaxRows and deleteSpecMaxRows) " +
          "— compact the table (SnapshotTable.compactScoped/" +
          "compactSnapshot purges deletes physically) or read via " +
          "SnapshotTable.read, whose anti-join shuffles instead")
    infos.map { d =>
      val casts = d.cols.map { c =>
        val t = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalStateException(
            s"delete key column '$c' missing from $root v$version schema"))
        // key matching below is JVM VALUE equality over internal
        // values. Atomics are safe (boxed primitives, UTF8String,
        // Decimal all define equals); BinaryType's internal value is
        // Array[Byte] (REFERENCE equality — normalized to a
        // byte-comparable wrapper on both sides, see normalize); and
        // struct/array/map internal values (InternalRow/ArrayData/
        // MapData) define NO value equality at all — matching on them
        // would silently delete nothing through the SQL doors while
        // the Scala door's <=> anti-join removes rows. Refuse loudly.
        t.dataType match {
          case _: org.apache.spark.sql.types.StructType |
               _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.MapType =>
            throw new UnsupportedOperationException(
              s"$root v$version: delete key column '$c' has nested type " +
                s"${t.dataType.simpleString} — the DSv2 merge-on-read " +
                "doors match keys by JVM value equality, which nested " +
                "internal values do not define; read via " +
                "SnapshotTable.read (null-safe anti-join) or re-key the " +
                "delete on atomic columns")
          case _ => ()
        }
        col(c).cast(t.dataType)
      }
      val df = spark.read.parquet(s"$root/${d.path}").select(casts: _*)
      val dts = df.schema.fields.map(_.dataType)
      // copy() per row: the internal-row iterator REUSES its buffer, so
      // a bare collect() would yield N references to the last key
      val keys = df.queryExecution.toRdd.map(_.copy()).collect().map { row =>
        dts.indices.map(i =>
          GraftMor.normalize(row.get(i, dts(i)), dts(i))): Seq[Any]
      }.toSet
      GraftDeleteSpec(d.cols, d.appliesBelow, keys)
    }
  }
}

/** Shared merge-on-read machinery for the batch scan and the
  * micro-batch stream — ONE implementation of the two delicate pieces
  * (the sequence-number partition split and the per-row key filter),
  * so batch and stream delete semantics cannot silently diverge.
  */
private[sources] object GraftMor {

  /** Does this key-column type need [[normalize]] before the boxed
    * equality lookup? Binary (reference equality) and floating types
    * (-0.0 vs 0.0: boxed equals/hash differ while the Scala door's
    * anti-join normalizes floats on its keys).
    */
  def needsNorm(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == org.apache.spark.sql.types.BinaryType ||
      dt == org.apache.spark.sql.types.DoubleType ||
      dt == org.apache.spark.sql.types.FloatType

  /** The canonical stand-in for a floating NaN key/probe value:
    * Scala's `==` on boxed doubles compares PRIMITIVELY (NaN != NaN),
    * while Spark's null-safe equality — the Scala door's anti-join —
    * treats NaN as equal to itself; both sides map NaN here so the
    * Set lookup agrees with the join. (Column types are fixed, so one
    * sentinel serves float and double columns alike.)
    */
  private case object NaNKey

  /** Key/probe value under a representation with VALUE equality under
    * Scala `==`/hash: BinaryType's internal Array[Byte] compares by
    * reference, so both the driver-resolved key set and the per-row
    * probe wrap it in an immutable ArraySeq (element-wise equals +
    * element-based hash); floating NaN maps to [[NaNKey]] (see there —
    * the -0.0/0.0 pair already agrees: Scala `==` and `anyHash` on
    * boxed doubles are primitive-valued, matching the SQL comparison
    * and the Scala door's normalized join keys). Everything else
    * passes through — atomic internal values already define the right
    * equality (nested types are refused at resolve).
    */
  def normalize(v: Any, dt: org.apache.spark.sql.types.DataType): Any =
    v match {
      case b: Array[Byte]
          if dt == org.apache.spark.sql.types.BinaryType =>
        scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
      case d: java.lang.Double if java.lang.Double.isNaN(d.doubleValue) =>
        NaNKey
      case f: java.lang.Float if java.lang.Float.isNaN(f.floatValue) =>
        NaNKey
      case other => other
    }

  /** Re-split parquet [[FilePartition]]s so every partition's files
    * share ONE delete-applicability profile (the set of deletes whose
    * sequence number exceeds the file's) — row-level filtering then
    * needs no per-row file attribution. Profiles are monotone in the
    * sequence number, so splits ≤ distinct delete versions + 1.
    */
  def splitByProfile(parts: Array[InputPartition],
                     specs: Seq[GraftDeleteSpec]): Array[InputPartition] =
    parts.flatMap {
      case fp: FilePartition =>
        fp.files.groupBy { pf =>
          val v = SnapshotTable.dataVersionOfFile(pf.filePath.toString)
          specs.indices.filter(i => v < specs(i).appliesBelow)
        }.map { case (applicable, files) =>
          GraftMorPartition(FilePartition(fp.index, files),
            applicable.toArray)
        }
      case other => throw new IllegalStateException(
        s"parquet batch planned a non-file partition: ${other.getClass}")
    }

  /** Row filter over `inner`: a row dies when any applicable delete's
    * key projection (null-safe, internal values) is in its key set.
    * Subclasses shape `get()` (projection differs between batch and
    * stream); `cur` holds the surviving delegate row. Probe buffers
    * are REUSED across rows (the Set lookup hashes the wrapped array
    * per call and retains nothing) — zero per-row allocation in the
    * filter itself.
    */
  abstract class FilteringReader(inner: PartitionReader[InternalRow],
      readSchema: StructType, applicable: Array[Int],
      specs: Array[GraftDeleteSpec]) extends PartitionReader[InternalRow] {

    protected val dts: Array[org.apache.spark.sql.types.DataType] =
      readSchema.fields.map(_.dataType)
    private val lower = readSchema.fields.map(_.name.toLowerCase)
      .zipWithIndex.toMap
    private val matchers = applicable.map { i =>
      val ords = specs(i).cols.map(c => lower(c.toLowerCase)).toArray
      // positions needing probe normalization (binary/float → the
      // value-equal representation the key set was built with)
      val norm = ords.map(o => GraftMor.needsNorm(dts(o)))
      (ords, norm, new Array[Any](ords.length), specs(i).keys)
    }
    protected var cur: InternalRow = _

    override def next(): Boolean = {
      while (inner.next()) {
        val r = inner.get()
        var dead = false
        var m = 0
        while (!dead && m < matchers.length) {
          val (ords, norm, probe, keys) = matchers(m)
          var i = 0
          while (i < ords.length) {
            val v = r.get(ords(i), dts(ords(i)))
            probe(i) = if (norm(i)) GraftMor.normalize(v, dts(ords(i))) else v
            i += 1
          }
          dead = keys.contains(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(probe))
          m += 1
        }
        if (!dead) { cur = r; return true }
      }
      false
    }
    override def close(): Unit = inner.close()
  }
}

/** One pinned resolution's scan-side inputs: the committed file list
  * WITH its per-file manifest stat envelopes (keyed by the same full
  * paths), plus everything needed to construct the stock parquet
  * machinery over any SUBSET of it — the scan builders re-plan over a
  * pruned list when pushed filters prove files dead by envelope
  * ([[GraftPrune]]).
  */
private[sources] case class GraftScanInputs(spark: SparkSession,
    name: String, schema: StructType, files: Seq[String],
    stats: Map[String, Map[String, (Long, Long)]]) {
  def parquetBuilder(options: CaseInsensitiveStringMap,
                     kept: Seq[String]): ParquetScanBuilder =
    ParquetTable(name, spark, options, kept, Some(schema),
      classOf[ParquetFileFormat])
      .newScanBuilder(options).asInstanceOf[ParquetScanBuilder]
}

/** A READ-ONLY veneer over the stock [[ParquetTable]]: scans delegate
  * verbatim (vectorized readers, pushdown, pruning — everything), but
  * the write capabilities are deliberately NOT exposed. A raw
  * [[ParquetTable]] is `SupportsWrite`, and `df.write.format(...)`
  * against it would write parquet files straight into the data tree —
  * bypassing the claim + manifest commit protocol and corrupting the
  * table. Without `BATCH_WRITE`, Spark routes writes to the provider's
  * V1 seam ([[GraftSnapshotSource.createRelation]]), which IS the
  * commit protocol. `inputs = None` marks a not-yet-existing table
  * (the write flow resolves it before creating): reads fail loudly.
  */
private[sources] class GraftReadTable(tableName: String, root: String,
    tableSchema: StructType, inputs: Option[GraftScanInputs],
    insertable: Boolean = false)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with GraftSqlDelete {
  protected def deleteRoot: String = root
  protected def deleteSchema: StructType = tableSchema
  protected def dmlEnabled: Boolean = insertable
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): java.util.Set[TableCapability] =
    if (insertable)
      // the CATALOG door: INSERT INTO / INSERT OVERWRITE plan as the
      // V1 write fallback riding the commit protocol (GraftV1Write)
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
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    inputs match {
      case Some(in) => new GraftStreamableScanBuilder(in, root, tableSchema, o)
      case None => throw new IllegalArgumentException(
        s"$root has no committed snapshot")
    }
}

/** The connector's MERGE-ON-READ table: the stock vectorized
  * [[ParquetTable]] machinery over the committed file list, with the
  * snapshot's equality deletes applied INSIDE the scan — the SQL door
  * reads the deleteWhere-then-compact steady state instead of refusing
  * it ([[SnapshotTable.read]] parity, spec-pinned).
  *
  * How the pieces keep the stock scan's strengths:
  *  - FILTER PUSHDOWN delegates verbatim to the parquet builder —
  *    deletes only REMOVE rows, so pushed predicates stay correct;
  *  - COLUMN PRUNING passes the UNION of the requested columns and the
  *    delete key columns to parquet (the filter must see its keys),
  *    then projects back to the requested shape per row;
  *  - PARTITION PLANNING reuses parquet's [[FilePartition]]s, re-split
  *    so every partition's files share one delete-applicability
  *    profile (the set of deletes whose sequence number exceeds the
  *    file's) — row-level filtering then needs no per-row file
  *    attribution;
  *  - the read is ROW-BASED (`supportColumnarReads = false`): the
  *    documented price of reading the MoR steady state through SQL.
  *    Delete-free snapshots never come here — they get the pure
  *    columnar [[ParquetTable]] fast path.
  */
private[sources] class GraftMorTable(tableName: String, root: String,
    in: GraftScanInputs, specs: Seq[GraftDeleteSpec],
    insertable: Boolean = false)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with GraftSqlDelete {

  protected def deleteRoot: String = root
  protected def deleteSchema: StructType = in.schema
  protected def dmlEnabled: Boolean = insertable

  override def name(): String = tableName
  override def schema(): StructType = in.schema
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): java.util.Set[TableCapability] =
    if (insertable)
      // INSERT under live equality deletes is safe: appended rows land
      // at a HIGHER sequence number, out of every delete's reach
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

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new GraftMorScanBuilder(in, root, specs, o)
}

/** Delegating scan builder: pushdown goes to parquet untouched; column
  * pruning widens the request by the delete key columns (recorded so
  * the scan can project back down); build() first prunes the FILE
  * LIST against the pushed filters' manifest envelopes (sound under
  * deletes: deletes only REMOVE rows, so a file dead by envelope
  * stays dead) and re-plans the stock parquet scan over the survivors.
  */
private[sources] class GraftMorScanBuilder(in: GraftScanInputs,
    root: String, specs: Seq[GraftDeleteSpec],
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  private val delegate = in.parquetBuilder(options, in.files)
  private var requested: StructType = in.schema
  private var widened: Option[StructType] = None
  private var raw: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    Nil

  override def pruneColumns(required: StructType): Unit = {
    requested = required
    val have = required.fields.map(_.name.toLowerCase).toSet
    val keyCols = specs.flatMap(_.cols).distinct
    val extra = in.schema.fields.filter(f =>
      keyCols.exists(_.equalsIgnoreCase(f.name)) &&
        !have.contains(f.name.toLowerCase))
    widened = Some(StructType(required.fields ++ extra))
    delegate.pruneColumns(widened.get)
  }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    raw = filters
    delegate.pushFilters(filters)
  }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate.pushedFilters

  override def build(): Scan = {
    val ranges = GraftPrune.ranges(raw)
    val kept = GraftPrune.prune(in.files, in.stats, ranges)
    // envelope-pruned file list: re-plan the parquet side over the
    // survivors, replaying the pushdown conversation verbatim
    val chosen =
      if (kept.size == in.files.size) delegate
      else {
        val b = in.parquetBuilder(options, kept)
        if (raw.nonEmpty) b.pushFilters(raw)
        widened.foreach(b.pruneColumns)
        b
      }
    // the built scan's readDataSchema is the delegate's ACTUAL row
    // layout (table-schema order filtered to the pruned names, nested
    // pruning applied) — ordinals below must come from it, not from
    // the struct handed to pruneColumns
    val ps = chosen.build()
    new GraftMorScan(ps, ps.readDataSchema,
      requested.fields.map(_.name).toSeq, specs, root, in.schema, options,
      ranges)
  }
}

/** A [[FilePartition]] whose files all share one delete-applicability
  * profile (`applicable` indexes into the scan's spec array).
  */
private[sources] case class GraftMorPartition(inner: FilePartition,
                                              applicable: Array[Int])
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

private[sources] class GraftMorScan(delegate: Scan, unionRead: StructType,
    requestedNames: Seq[String], specs: Seq[GraftDeleteSpec],
    root: String, tableSchema: StructType,
    options: CaseInsensitiveStringMap,
    ranges: Seq[(String, Long, Long)] = Nil)
    extends Scan with Batch {

  /** Streaming a delete-carrying table: deletes are resolved PER BATCH
    * by [[GraftMicroBatchStream]] anyway (each diff read applies its
    * end version's deletes), so the stream needs only the table
    * coordinates — plus the pushed filters' envelope ranges, so each
    * batch's manifest diff prunes files the same way the batch door
    * does.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(SparkSession.active, root, tableSchema,
      options, checkpointLocation, ranges)

  private val ordinalOf: Map[String, Int] =
    unionRead.fields.map(_.name.toLowerCase).zipWithIndex.toMap

  override def readSchema(): StructType =
    StructType(requestedNames.map(n => unionRead(ordinalOf(n.toLowerCase))))

  override def description(): String =
    s"GraftMorScan(${specs.size} equality-delete files) over " +
      delegate.description()

  override def toBatch: Batch = this

  private lazy val delegateBatch = delegate.toBatch

  override def planInputPartitions(): Array[InputPartition] =
    GraftMor.splitByProfile(delegateBatch.planInputPartitions(), specs)

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftMorReaderFactory(delegateBatch.createReaderFactory(),
      unionRead,
      requestedNames.map(n => ordinalOf(n.toLowerCase)).toArray,
      specs.toArray)
}

private[sources] class GraftMorReaderFactory(delegate: PartitionReaderFactory,
    unionRead: StructType, outOrdinals: Array[Int],
    specs: Array[GraftDeleteSpec]) extends PartitionReaderFactory {

  // the delete filter needs per-row value access — the documented
  // row-based price of the MoR read path. This is all-or-nothing by
  // Spark's contract (BatchScanExec refuses mixed row/columnar
  // partitions in one scan), so even partitions whose delete set is
  // empty read row-based here; the delete-FREE snapshot never comes
  // through this factory at all (it gets the pure columnar path).
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case GraftMorPartition(inner, applicable) =>
        new GraftMor.FilteringReader(delegate.createReader(inner),
            unionRead, applicable, specs) {
          override def get(): InternalRow = {
            val out = new GenericInternalRow(outOrdinals.length)
            var i = 0
            while (i < outOrdinals.length) {
              // copyValue: the inner reader reuses row/vector buffers,
              // and the projected row must stay valid independently
              out.update(i, InternalRow.copyValue(
                cur.get(outOrdinals(i), dts(outOrdinals(i)))))
              i += 1
            }
            out
          }
        }
      case other => throw new IllegalStateException(
        s"unexpected partition type: ${other.getClass}")
    }
}
