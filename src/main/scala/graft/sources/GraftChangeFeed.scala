package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast,
  Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** CHANGE DATA FEED over the snapshot table — the streaming-OUT
  * counterpart of the exactly-once ledger's streaming-in:
  *
  * {{{
  * spark.readStream.format("graft-snapshot")
  *   .option("readChangeFeed", "true").load(root)
  * }}}
  *
  * Rows carry the table's columns plus `_change_type` ("insert" |
  * "delete") and `_commit_version`. Versions classify by their `#op`
  * manifest header:
  *
  *  - append      → the added files' rows as INSERTS;
  *  - delete      → the new equality-delete files' KEY rows as
  *                  RETRACTIONS (key columns populated, the rest
  *                  null) — a downstream materialization applies them
  *                  to every matching row it holds with a LOWER
  *                  `_commit_version`, exactly the sequence-number
  *                  rule the table itself resolves reads by;
  *  - compact / rewriteManifests → NOTHING: rewritten rows are not
  *                  changes, and without this a maintenance pass would
  *                  re-deliver the whole table;
  *  - deleteRange  → ONE `delete_range` event row: data columns null,
  *                  `_range_col`/`_range_lo`/`_range_hi` carry the
  *                  commit's recorded parameters — a downstream
  *                  materialization deletes every held row with a
  *                  LOWER `_commit_version` whose `cast(col as long)`
  *                  falls in [lo, hi] (null/non-castable values
  *                  survive — SQL DELETE semantics, the table's own
  *                  rule). The commit's boundary-file rewrite is
  *                  purely physical (surviving rows keep their
  *                  identity), so the rewritten files are NOT
  *                  re-emitted as inserts. A retention sweep on a
  *                  time-clustered table thus costs the feed one row,
  *                  not a restart. Pre-`#range`-header range commits
  *                  still refuse (the parameters are unrecoverable);
  *  - merge / replace → loud refusal: those commits rewrite rows in
  *                  place, which a feed of inserts+retractions cannot
  *                  express without pre-images; consume such tables
  *                  via the plain stream (net post-state) or restart
  *                  the feed.
  *
  * Pre-`#op` manifests (r13 and earlier) classify by INFERENCE where
  * the shape is unambiguous (pure-append / pure-delete / identical
  * file set) and refuse otherwise. A one-shot `#op` BACKFILL was
  * considered and rejected: the ambiguous shapes are ambiguous
  * precisely because append-with-compaction and replace share a
  * manifest signature, and a backfill that guessed would turn
  * today's loud refusal into silently wrong downstream state — the
  * refusal already names the honest remedy (start the feed from a
  * later `startingVersion`, which every post-r14 commit satisfies
  * because commitManifest stamps `#op` unconditionally).
  *
  * Apply CDF events in `_commit_version` order (a single micro-batch
  * may span several versions). The bootstrap (no `startingVersion`)
  * replays every RETAINED version from the first — inserts stamped
  * with their file's own sequence number, live delete lines as
  * retractions at theirs — so the net materialization at the end of
  * the bootstrap equals the snapshot. Offsets, pacing
  * (`maxVersionsPerTrigger`), retention pins and restart semantics
  * are the plain stream's, unchanged.
  */
private[sources] object GraftCdf {

  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val RangeColCol = "_range_col"
  val RangeLoCol = "_range_lo"
  val RangeHiCol = "_range_hi"

  /** The feed's schema: the data columns FORCED NULLABLE — a delete
    * retraction populates only its key columns, and advertising the
    * committed non-null flags would let the optimizer constant-fold
    * `IS NULL` on the nulled-out columns to false — plus the two
    * change stamps (genuinely non-null: every row carries literals)
    * and the three range-retraction columns (populated only on
    * `delete_range` rows, appended LAST so positional consumers of
    * the original shape keep their ordinals).
    */
  def schemaOf(data: StructType): StructType =
    StructType(data.fields.map(_.copy(nullable = true)))
      .add(ChangeTypeCol, StringType, nullable = false)
      .add(CommitVersionCol, LongType, nullable = false)
      .add(RangeColCol, StringType, nullable = true)
      .add(RangeLoCol, LongType, nullable = true)
      .add(RangeHiCol, LongType, nullable = true)

  def requested(options: CaseInsensitiveStringMap): Boolean =
    options.getBoolean("readChangeFeed", false)

  /** One emission unit: a set of parquet files serving rows of one
    * change type at one commit-version stamp.
    */
  private case class Slice(files: Seq[String], decode: Option[StructType],
                           changeType: String, version: Long)

  /** Plan the CDF micro-batch (from, to]: classify every existing
    * version in the range, derive its slices, and lower them onto
    * stock parquet scans — one reader factory per slice, dispatched
    * per partition by a composite.
    */
  def plan(spark: SparkSession, root: String, pinned: StructType,
           options: CaseInsensitiveStringMap, from: Long, to: Long)
      : (Array[InputPartition], PartitionReaderFactory) = {
    val versions = SnapshotTable.versionsOf(spark, root)
      .filter(v => v > from && v <= to)
    var prevFiles: Set[String] =
      if (from == 0L) Set.empty
      else SnapshotTable.snapshotFiles(spark, root, from).toSet
    var prevDeletes: Set[String] =
      if (from == 0L) Set.empty
      else SnapshotTable.deleteFileInfos(spark, root, from).map(_.path).toSet
    var bootstrap = from == 0L
    val slices = Seq.newBuilder[Slice]
    val rangeEvents = Seq.newBuilder[CdfRangePartition]
    versions.foreach { v =>
      val files = SnapshotTable.snapshotFiles(spark, root, v)
      val delInfos = SnapshotTable.deleteFileInfos(spark, root, v)
      val added = files.filterNot(prevFiles)
      val newDeletes = delInfos.filterNot(d => prevDeletes(d.path))
      val schemaAtV = SnapshotTable.snapshotSchema(spark, root, v)
        .getOrElse(pinned)
      def insertsByStamp(fs: Seq[String]): Unit =
        fs.groupBy(SnapshotTable.dataVersionOfFile).toSeq.sortBy(_._1)
          .foreach { case (dv, g) =>
            slices += Slice(g, Some(schemaAtV), "insert", dv)
          }
      if (bootstrap) {
        // the first retained version: EVERYTHING it lists is an
        // insert (stamped by each file's own sequence number, so
        // retractions order correctly against them); its live delete
        // lines retract at theirs
        insertsByStamp(added)
        newDeletes.foreach(d => slices += Slice(Seq(d.path), None, "delete",
          SnapshotTable.dataVersionOfFile(d.path)))
        bootstrap = false
      } else {
        // only the rare pre-#op inference needs this; lazy keeps the
        // common (#op-stamped) path from paying a set-diff per version
        lazy val dropped = {
          val fs = files.toSet
          prevFiles.exists(p => !fs(p))
        }
        val op = SnapshotTable.commitOp(spark, root, v).getOrElse {
          // pre-#op manifests: infer the unambiguous shapes
          if (newDeletes.nonEmpty && added.isEmpty) "delete"
          else if (added.nonEmpty && !dropped && newDeletes.isEmpty) "append"
          else if (added.isEmpty && newDeletes.isEmpty) "rewriteManifests"
          else throw new UnsupportedOperationException(
            s"$root v$v pre-dates the #op header and its shape is " +
              "ambiguous — the change feed cannot classify it; start " +
              "the feed from a later version")
        }
        op match {
          case "append" => insertsByStamp(added)
          case "delete" => newDeletes.foreach(d =>
            slices += Slice(Seq(d.path), None, "delete", v))
          case "compact" | "rewriteManifests" => () // not changes
          case "deleteRange" =>
            // one event row; the boundary rewrite's new files are
            // purely physical and intentionally NOT re-emitted as
            // inserts (downstream already holds the surviving rows)
            val (rc, lo, hi) = SnapshotTable.commitRange(spark, root, v)
              .getOrElse(throw new UnsupportedOperationException(
                s"$root v$v is a deleteRange commit without a #range " +
                  "header (pre-dates range-retraction support): its " +
                  "parameters are unrecoverable, so the change feed " +
                  "cannot express it — restart the feed from a fresh " +
                  "startingVersion"))
            rangeEvents += CdfRangePartition(rc, lo, hi, v)
          case other => throw new UnsupportedOperationException(
            s"$root v$v is a '$other' commit: the change feed cannot " +
              "express in-place rewrites as inserts+retractions. " +
              "Consume the plain stream (net post-state per scope) or " +
              "restart the change feed from a fresh startingVersion")
        }
      }
      prevFiles = files.toSet
      prevDeletes = delInfos.map(_.path).toSet
    }
    lower(spark, root, pinned, options, slices.result(), rangeEvents.result())
  }

  /** Lower slices onto stock parquet scans. Insert slices decode under
    * their version's committed schema pruned to the pinned columns;
    * delete slices decode the key file under its own (inferred)
    * schema. The per-slice projection to the CDF shape happens in the
    * composite factory's readers.
    */
  private def lower(spark: SparkSession, root: String, pinned: StructType,
                    options: CaseInsensitiveStringMap, slices: Seq[Slice],
                    ranges: Seq[CdfRangePartition])
      : (Array[InputPartition], PartitionReaderFactory) = {
    if (slices.isEmpty && ranges.isEmpty)
      return (Array.empty, EmptyReaderFactory)
    val parts = Array.newBuilder[InputPartition]
    ranges.foreach(parts += _)
    if (slices.isEmpty)
      return (parts.result(), new CdfCompositeFactory(Array.empty, pinned))
    val facs = slices.zipWithIndex.map { case (s, idx) =>
      val pt = ParquetTable(s"graft-cdf $root@${s.version}/${s.changeType}",
        spark, options, s.files.map(rel => s"$root/$rel"), s.decode,
        classOf[ParquetFileFormat])
      val sb = pt.newScanBuilder(options).asInstanceOf[ParquetScanBuilder]
      s.decode.foreach { dec =>
        // only the pinned columns matter downstream; key files (decode
        // inferred) read whole — they ARE the payload
        sb.pruneColumns(StructType(dec.fields.filter(f =>
          pinned.fields.exists(_.name.equalsIgnoreCase(f.name)))))
      }
      val ps = sb.build()
      ps.toBatch.planInputPartitions().foreach(p =>
        parts += CdfPartition(p, idx))
      CdfSliceFactory(ps.toBatch.createReaderFactory(), ps.readDataSchema,
        s.changeType, s.version)
    }
    (parts.result(), new CdfCompositeFactory(facs.toArray, pinned))
  }
}

/** A partition of one CDF slice: the parquet partition plus the index
  * of the slice (reader factory + stamp) it belongs to.
  */
private[sources] case class CdfPartition(inner: InputPartition, slice: Int)
    extends InputPartition {
  override def preferredLocations(): Array[String] = inner.preferredLocations()
}

/** A deleteRange commit's single synthetic event: no files — the
  * reader emits ONE row with the data columns null and the range
  * columns carrying the commit's recorded parameters.
  */
private[sources] case class CdfRangePartition(col: String, lo: Long,
    hi: Long, version: Long) extends InputPartition

/** One slice's reader inputs: the stock parquet factory, the schema
  * its rows decode under, and the change-type/version stamps.
  */
private[sources] case class CdfSliceFactory(
    delegate: PartitionReaderFactory, readSchema: StructType,
    changeType: String, version: Long)

/** Dispatches per-partition to its slice's parquet reader and projects
  * each row to the CDF shape: pinned columns cast by name (absent →
  * null — delete-key rows populate only their key columns), then the
  * `_change_type` and `_commit_version` literals. Codegen'd projection,
  * zero per-row branching.
  */
private[sources] class CdfCompositeFactory(slices: Array[CdfSliceFactory],
    pinned: StructType) extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case CdfPartition(inner, idx) =>
        val s = slices(idx)
        val lower = s.readSchema.fields.map(_.name.toLowerCase)
          .zipWithIndex.toMap
        val rdts = s.readSchema.fields.map(_.dataType)
        val exprs: Seq[Expression] = pinned.fields.toSeq.map { f =>
          lower.get(f.name.toLowerCase) match {
            case Some(j) => Cast(
              BoundReference(j, rdts(j), nullable = true), f.dataType,
              Some("UTC"))
            case None => Literal(null, f.dataType)
          }
        } ++ Seq(
          Literal(UTF8String.fromString(s.changeType), StringType),
          Literal(s.version, LongType),
          Literal(null, StringType), // _range_col: file rows carry none
          Literal(null, LongType), Literal(null, LongType))
        val inner0 = s.delegate.createReader(inner)
        new PartitionReader[InternalRow] {
          private lazy val project = UnsafeProjection.create(exprs)
          override def next(): Boolean = inner0.next()
          override def get(): InternalRow = project(inner0.get())
          override def close(): Unit = inner0.close()
        }
      case CdfRangePartition(rc, lo, hi, v) =>
        // one literal row: data columns null, range columns populated
        val exprs: Seq[Expression] =
          pinned.fields.toSeq.map(f => Literal(null, f.dataType)) ++ Seq(
            Literal(UTF8String.fromString("delete_range"), StringType),
            Literal(v, LongType),
            Literal(UTF8String.fromString(rc), StringType),
            Literal(lo, LongType), Literal(hi, LongType))
        new PartitionReader[InternalRow] {
          private var emitted = false
          override def next(): Boolean = !emitted && { emitted = true; true }
          override def get(): InternalRow =
            UnsafeProjection.create(exprs)(InternalRow.empty)
          override def close(): Unit = ()
        }
      case other => throw new IllegalStateException(
        s"unexpected partition type: ${other.getClass}")
    }
}

/** The CDF table: a streaming-only surface (batch reads of a change
  * feed have no defined point-in-time meaning here — read the table
  * itself for state). The scan carries the widened CDF schema; the
  * stream below re-resolves each batch's slices from manifests.
  */
private[sources] class GraftCdfTable(tableName: String, root: String,
    dataSchema: StructType) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = GraftCdf.schemaOf(dataSchema)
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = GraftCdf.schemaOf(dataSchema)
        override def description(): String = s"GraftCdfScan $root"
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new GraftMicroBatchStream(SparkSession.active, root, dataSchema,
            o, checkpointLocation, cdf = true)
      }
    }
}
