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
  /** Resolve snapshot `version`'s equality deletes to executor-
    * shippable specs: key columns CAST to the table's column types
    * (the anti-join the Scala reader plans would insert the same
    * casts), key rows collected driver-side. The manifest-certified
    * backlog is size-checked FIRST — the keys ship with reader
    * factories (task broadcast), so an oversized backlog must fail at
    * planning with the remedies named, never as an executor OOM.
    */
  def resolve(spark: SparkSession, root: String, version: Long,
              schema: StructType): Seq[GraftDeleteSpec] = {
    import org.apache.spark.sql.functions.col
    val infos = SnapshotTable.deleteFileInfos(spark, root, version)
    if (infos.isEmpty) return Nil
    val backlog = infos.map(_.rows).sum
    if (backlog > SnapshotTable.deleteBroadcastMaxRows)
      throw new UnsupportedOperationException(
        s"$root v$version: $backlog outstanding delete-key rows exceed " +
          s"deleteBroadcastMaxRows=${SnapshotTable.deleteBroadcastMaxRows} " +
          "— compact the table (SnapshotTable.compactScoped/" +
          "compactSnapshot purges deletes physically) or read via " +
          "SnapshotTable.read, whose anti-join shuffles instead")
    infos.map { d =>
      val casts = d.cols.map { c =>
        val t = schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalStateException(
            s"delete key column '$c' missing from $root v$version schema"))
        col(c).cast(t.dataType)
      }
      val df = spark.read.parquet(s"$root/${d.path}").select(casts: _*)
      val dts = df.schema.fields.map(_.dataType)
      // copy() per row: the internal-row iterator REUSES its buffer, so
      // a bare collect() would yield N references to the last key
      val keys = df.queryExecution.toRdd.map(_.copy()).collect().map { row =>
        dts.indices.map(i => row.get(i, dts(i))): Seq[Any]
      }.toSet
      GraftDeleteSpec(d.cols, d.appliesBelow, keys)
    }
  }
}

/** A READ-ONLY veneer over the stock [[ParquetTable]]: scans delegate
  * verbatim (vectorized readers, pushdown, pruning — everything), but
  * the write capabilities are deliberately NOT exposed. A raw
  * [[ParquetTable]] is `SupportsWrite`, and `df.write.format(...)`
  * against it would write parquet files straight into the data tree —
  * bypassing the claim + manifest commit protocol and corrupting the
  * table. Without `BATCH_WRITE`, Spark routes writes to the provider's
  * V1 seam ([[GraftSnapshotSource.createRelation]]), which IS the
  * commit protocol. `delegate = None` marks a not-yet-existing table
  * (the write flow resolves it before creating): reads fail loudly.
  */
private[sources] class GraftReadTable(tableName: String, root: String,
    tableSchema: StructType, delegate: Option[Table])
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    delegate match {
      case Some(t) => new GraftStreamableScanBuilder(
        t.asInstanceOf[SupportsRead].newScanBuilder(o)
          .asInstanceOf[ParquetScanBuilder], root, tableSchema, o)
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
    spark: SparkSession, options: CaseInsensitiveStringMap,
    files: Seq[String], tableSchema: StructType,
    specs: Seq[GraftDeleteSpec])
    extends Table with SupportsRead {

  private val parquet = ParquetTable(tableName, spark, options, files,
    Some(tableSchema), classOf[ParquetFileFormat])

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new GraftMorScanBuilder(
      parquet.newScanBuilder(o).asInstanceOf[ParquetScanBuilder],
      root, tableSchema, specs, o)
}

/** Delegating scan builder: pushdown goes to parquet untouched; column
  * pruning widens the request by the delete key columns (recorded so
  * the scan can project back down).
  */
private[sources] class GraftMorScanBuilder(delegate: ParquetScanBuilder,
    root: String, tableSchema: StructType, specs: Seq[GraftDeleteSpec],
    options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  private var requested: StructType = tableSchema

  override def pruneColumns(required: StructType): Unit = {
    requested = required
    val have = required.fields.map(_.name.toLowerCase).toSet
    val keyCols = specs.flatMap(_.cols).distinct
    val extra = tableSchema.fields.filter(f =>
      keyCols.exists(_.equalsIgnoreCase(f.name)) &&
        !have.contains(f.name.toLowerCase))
    delegate.pruneColumns(StructType(required.fields ++ extra))
  }

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    delegate.pushFilters(filters)

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate.pushedFilters

  override def build(): Scan = {
    // the built scan's readDataSchema is the delegate's ACTUAL row
    // layout (table-schema order filtered to the pruned names, nested
    // pruning applied) — ordinals below must come from it, not from
    // the struct handed to pruneColumns
    val ps = delegate.build()
    new GraftMorScan(ps, ps.readDataSchema,
      requested.fields.map(_.name).toSeq, specs, root, tableSchema, options)
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
    options: CaseInsensitiveStringMap)
    extends Scan with Batch {

  /** Streaming a delete-carrying table: deletes are resolved PER BATCH
    * by [[GraftMicroBatchStream]] anyway (each diff read applies its
    * end version's deletes), so the stream needs only the table
    * coordinates, not this scan's snapshot-wide spec set.
    */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(SparkSession.active, root, tableSchema,
      options, checkpointLocation)

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
    delegateBatch.planInputPartitions().flatMap {
      case fp: FilePartition =>
        // split so each partition's files see the SAME delete set —
        // profiles are monotone in the file's sequence number, so the
        // split count is bounded by the distinct delete versions + 1
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
  // row-based price of the MoR read path
  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case GraftMorPartition(inner, applicable) =>
        val reader = delegate.createReader(inner)
        val dts = unionRead.fields.map(_.dataType)
        val lower = unionRead.fields.map(_.name.toLowerCase).zipWithIndex.toMap
        val matchers = applicable.map { i =>
          (specs(i).cols.map(c => lower(c.toLowerCase)).toArray, specs(i).keys)
        }
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = {
            while (reader.next()) {
              val r = reader.get()
              val dead = matchers.exists { case (ords, keys) =>
                keys.contains(ords.toSeq.map(o => r.get(o, dts(o))))
              }
              if (!dead) { cur = r; return true }
            }
            false
          }
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
          override def close(): Unit = reader.close()
        }
      case other => throw new IllegalStateException(
        s"unexpected partition type: ${other.getClass}")
    }
}
