package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast,
  Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset => V2Offset}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Stream offsets ARE snapshot versions (delivered-through, inclusive).
  * The JSON form is the bare number — byte-compatible with the V1
  * source's LongOffset checkpoints, so existing checkpoints resume.
  */
private[sources] case class GraftVersionOffset(version: Long) extends V2Offset {
  override def json(): String = version.toString
}

/** Scan-builder veneer for [[GraftReadTable]]: batch work delegates
  * verbatim to the parquet builder (pushdown, pruning — the veneer
  * implements the same interfaces), and `build()` wraps the scan so it
  * ALSO answers `toMicroBatchStream` — one table serves
  * `spark.read` (stock vectorized batch) and `spark.readStream` (the
  * DSv2 micro-batch stream below) without a V1 `Source` in sight.
  * `build()` additionally prunes the FILE LIST against the pushed
  * filters' manifest stat envelopes ([[GraftPrune]]): files provably
  * dead by envelope are never handed to parquet at all — the
  * [[SnapshotTable.readPruned]] skip, now on the SQL path.
  */
private[sources] class GraftStreamableScanBuilder(in: GraftScanInputs,
    root: String, tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownCatalystFilters {

  private val delegate = in.parquetBuilder(options, in.files)
  private var required: Option[StructType] = None
  private var raw: Seq[Expression] = Nil

  override def pruneColumns(required: StructType): Unit = {
    this.required = Some(required)
    delegate.pruneColumns(required)
  }

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    raw = filters
    delegate.pushFilters(filters)
  }

  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    delegate.pushedFilters

  override def build(): Scan = {
    val ranges = GraftPrune.ranges(raw)
    val kept = GraftPrune.prune(in.files, in.stats, ranges)
    val chosen =
      if (kept.size == in.files.size) delegate
      else {
        // re-plan the stock parquet scan over the envelope survivors,
        // replaying the pushdown conversation verbatim
        val b = in.parquetBuilder(options, kept)
        if (raw.nonEmpty) b.pushFilters(raw)
        required.foreach(b.pruneColumns)
        b
      }
    new GraftStreamableScan(chosen.build(), root, tableSchema, options, ranges)
  }
}

/** Batch reads delegate whole (same Batch object — vectorized readers,
  * pushdown untouched); `toMicroBatchStream` starts the version-offset
  * stream. `readSchema` is the delegate's for batch correctness; the
  * STREAM always serves the table schema pinned at load.
  */
private[sources] class GraftStreamableScan(delegate: Scan, root: String,
    tableSchema: StructType, options: CaseInsensitiveStringMap,
    ranges: Seq[(String, Long, Long)] = Nil)
    extends Scan {
  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()
  override def toBatch: Batch = delegate.toBatch
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(SparkSession.active, root, tableSchema,
      options, checkpointLocation, ranges)
}

/** The snapshot table as a DataSourceV2 MICRO-BATCH STREAM — the
  * version-offset contract of the retired V1 source, on the modern
  * interface (no `execution.streaming` internals, no isStreaming
  * shim):
  *
  *  - offsets are versions; a micro-batch (start, end] is the manifest
  *    DIFF read delete-aware (the files added in that range, minus
  *    version-`end`'s equality deletes), so a batch costs its changes;
  *  - `startingVersion` absent → bootstrap (first batch = the full
  *    snapshot), `"latest"` → only post-start changes, `<v>` → changes
  *    after v;
  *  - `maxVersionsPerTrigger` paces catch-up, with the served
  *    high-water mark persisted under the checkpoint so a CLEAN
  *    restart never re-caps below the committed offset;
  *  - every planned batch lays a retention pin at its replay floor and
  *    `commit` raises it — vacuum coordination identical to the batch
  *    consumers';
  *  - the stream serves the schema PINNED at start: each batch's files
  *    are read under THEIR committed schema (so widened columns
  *    decode correctly) and cast/projected to the pinned shape with a
  *    codegen'd projection.
  */
private[sources] class GraftMicroBatchStream(spark: SparkSession,
    root: String, pinned: StructType, options: CaseInsensitiveStringMap,
    checkpointLocation: String,
    ranges: Seq[(String, Long, Long)] = Nil,
    cdf: Boolean = false) extends MicroBatchStream {

  private val startAfter: Long =
    Option(options.get("startingVersion")).map(_.trim) match {
      case Some("latest") => SnapshotTable.currentVersion(spark, root)
      case Some(v) => v.toLong
      case None => 0L // version 0 = nothing delivered yet → full snapshot
    }
  private val maxPerTrigger: Option[Long] =
    Option(options.get("maxVersionsPerTrigger")).map(_.toLong)
  maxPerTrigger.foreach(m => require(m >= 1, "maxVersionsPerTrigger >= 1"))

  private val mfs = new org.apache.hadoop.fs.Path(checkpointLocation)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val hwmFile =
    new org.apache.hadoop.fs.Path(checkpointLocation, "graft-served-hwm")

  /** See the V1 predecessor's rationale, unchanged: pacing state must
    * survive a clean restart or `maxVersionsPerTrigger` re-caps below
    * the checkpointed offset and re-serves delivered ranges. Torn read
    * → the startAfter floor (pre-persistence behavior, never loss).
    */
  private def readHwm(): Long =
    if (!mfs.exists(hwmFile)) startAfter
    else {
      val in = mfs.open(hwmFile)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      scala.util.Try(txt.trim.toLong).getOrElse(startAfter)
    }

  private def writeHwm(v: Long): Unit = {
    val out = mfs.create(hwmFile, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  @volatile private var served: Long = math.max(startAfter, readHwm())

  /** Can `latestOffset` CAP safely? Capping below the checkpoint's
    * committed offset would REGRESS the offset log and re-deliver
    * committed version ranges — and Spark calls `latestOffset` on
    * restart BEFORE handing us any logged offset to learn the floor
    * from. The floor is known when the persisted mark exists, or when
    * there is no offset log yet (a fresh stream: the floor IS
    * startAfter). A restarted stream WITHOUT the mark (a pre-mark
    * checkpoint, or a torn mark read) serves its first batch UNCAPPED
    * — one unpaced catch-up batch is the safe degradation; pacing
    * resumes once the first batch re-establishes the mark.
    */
  @volatile private var paceFloorKnown: Boolean =
    mfs.exists(hwmFile) || {
      val parent = new org.apache.hadoop.fs.Path(checkpointLocation).getParent
      val ckptRoot =
        if (parent != null && parent.getName == "sources") Option(parent.getParent)
        else None
      !ckptRoot.exists { r =>
        val off = new org.apache.hadoop.fs.Path(r, "offsets")
        mfs.exists(off) && mfs.listStatus(off).nonEmpty
      }
    }

  private def raiseServed(v: Long): Unit =
    if (v > served) { served = v; writeHwm(v); paceFloorKnown = true }
    else if (!paceFloorKnown && v >= startAfter) paceFloorKnown = true

  override def initialOffset(): V2Offset = GraftVersionOffset(startAfter)

  override def deserializeOffset(json: String): V2Offset = {
    val v = json.trim.toLong
    // any checkpointed offset passing through teaches us the floor
    raiseServed(v)
    GraftVersionOffset(v)
  }

  /** The replay floor this stream last pinned, and when it last TOUCHED
    * the pin file. planInputPartitions/commit refresh the pin — but
    * they only run when the table has NEW versions, so a live stream
    * idling on a quiet table would stop refreshing and its pin would
    * age out under vacuum's `pinMaxAgeMs` like a dead consumer's; a
    * later burst of commits plus an aggressive vacuum between triggers
    * could then sweep the manifest its next diff needs. `latestOffset`
    * fires EVERY trigger regardless of data, so it re-touches the pin
    * on a throttled cadence ([[GraftMicroBatchStream.pinRefreshMs]]) —
    * liveness tied to the trigger loop, not to data arrival.
    */
  // seeded from the PREVIOUS process's own pin file at construction:
  // a restarted stream on a quiet table plans no batch (and may never
  // deserialize an offset), so without the seed the idle refresh
  // would not engage and the pin would age out like a dead
  // consumer's. The pin file is the ONLY safe seed — the pacing mark
  // and the offset log can sit ABOVE the committed offset (a pending
  // batch), and refreshing from them would RAISE the pin past the
  // replay floor the recovered batch still needs
  @volatile private var lastPinnedFloor: Long = {
    // pin writes truncate-then-write, so a reader can catch a TORN
    // (empty) file — readPin surfaces that as Some(0), the value every
    // OTHER consumer treats conservatively (vacuum keeps everything,
    // DROP refuses). Here 0 would silently DISABLE the idle refresh,
    // so retry past the microseconds-wide window (the only writer of
    // this pin is this stream's own predecessor winding down)
    var seed = SnapshotTable.pinOf(spark, root, checkpointLocation)
    var tries = 0
    while (seed.contains(0L) && tries < 5) {
      Thread.sleep(20); tries += 1
      seed = SnapshotTable.pinOf(spark, root, checkpointLocation)
    }
    seed.filter(_ >= 1L).getOrElse(0L)
  }
  @volatile private var lastPinTouchMs: Long = System.currentTimeMillis()

  private def pinFloor(floor: Long): Unit = {
    SnapshotTable.pinVersion(spark, root, checkpointLocation, floor)
    lastPinnedFloor = math.max(lastPinnedFloor, floor)
    lastPinTouchMs = System.currentTimeMillis()
  }

  override def latestOffset(): V2Offset = {
    if (lastPinnedFloor >= 1L && System.currentTimeMillis() - lastPinTouchMs >
        GraftMicroBatchStream.pinRefreshMs)
      pinFloor(lastPinnedFloor)
    val cur = SnapshotTable.currentVersion(spark, root)
    val capped = maxPerTrigger match {
      case Some(m) if paceFloorKnown =>
        math.min(cur, math.max(served, startAfter) + m)
      case _ => cur
    }
    GraftVersionOffset(math.max(capped, startAfter))
  }

  /** Per-batch plan state: planInputPartitions and createReaderFactory
    * are driver-side and sequential within one micro-batch's planning,
    * and the factory depends on the batch's resolved schema + delete
    * set — stashed here between the two calls.
    */
  @volatile private var batchFactory: PartitionReaderFactory = _

  /** Delete specs cached by the snapshot's delete-file set: most
    * consecutive batches share it (deletes land rarely relative to
    * appends), and re-collecting the key backlog from parquet every
    * trigger would charge steady-state ingest for a rare event.
    */
  @volatile private var specCache
      : Option[(Set[String], Seq[GraftDeleteSpec])] = None

  private def specsFor(to: Long, atTo: StructType): Seq[GraftDeleteSpec] = {
    val infos = SnapshotTable.deleteFileInfos(spark, root, to)
    val key = infos.map(_.path).toSet
    specCache match {
      case Some((k, s)) if k == key => s
      case _ =>
        val s = GraftDeleteSpec.resolve(spark, root, to, atTo, infos)
        specCache = Some((key, s))
        s
    }
  }

  override def planInputPartitions(start: V2Offset, end: V2Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[GraftVersionOffset].version
    val to = end.asInstanceOf[GraftVersionOffset].version
    raiseServed(to)
    // retention pin at the replay floor (durable `start`; a plain
    // bootstrap pins its end — it reads only manifest `to`'s files).
    // The CDF bootstrap replays EVERY retained version's manifest and
    // files, so its floor is the lowest existing version: a concurrent
    // vacuum must not sweep history out from under the replay
    val floor =
      if (from >= 1L) from
      else if (cdf) SnapshotTable.versionsOf(spark, root)
        .headOption.getOrElse(to)
      else to
    if (floor >= 1L) pinFloor(floor)
    if (from >= to) { batchFactory = EmptyReaderFactory; return Array.empty }
    if (cdf) {
      // CHANGE FEED: classify every version in (from, to] by its #op
      // header and emit inserts/retractions (GraftCdf); offsets,
      // pacing and pins above are shared with the plain stream
      val (parts, fac) = GraftCdf.plan(spark, root, pinned, options, from, to)
      batchFactory = fac
      return parts
    }
    val addedEntries =
      if (from == 0L) SnapshotTable.snapshotEntries(spark, root, to) // bootstrap
      else {
        val before = SnapshotTable.snapshotFiles(spark, root, from).toSet
        SnapshotTable.snapshotEntries(spark, root, to)
          .filterNot(e => before(e.path))
      }
    // the batch door's envelope skip, per micro-batch: files of the
    // diff provably dead under the query's pushed filters are never
    // read (a filtered stream over a time-clustered table pays only
    // for the slices it asked for)
    val files = addedEntries
      .filter(e => GraftPrune.keep(e.stats, ranges)).map(_.path)
    if (files.isEmpty) { batchFactory = EmptyReaderFactory; return Array.empty }
    // the batch's files decode under the schema THEY were committed
    // with; the reader then casts/projects to the pinned stream shape
    val atTo = SnapshotTable.snapshotSchema(spark, root, to).getOrElse(pinned)
    val specs = specsFor(to, atTo)
    val keyCols = specs.flatMap(_.cols.map(_.toLowerCase)).toSet
    val needed = StructType(atTo.fields.filter(f =>
      keyCols.contains(f.name.toLowerCase) ||
        pinned.fields.exists(_.name.equalsIgnoreCase(f.name))))
    val pt = ParquetTable(s"graft-snapshot-stream $root@($from,$to]", spark,
      options, files.map(rel => s"$root/$rel"), Some(atTo),
      classOf[ParquetFileFormat])
    val sb = pt.newScanBuilder(options).asInstanceOf[ParquetScanBuilder]
    sb.pruneColumns(needed)
    val ps = sb.build()
    batchFactory = new GraftStreamReaderFactory(
      ps.toBatch.createReaderFactory(), ps.readDataSchema, pinned,
      specs.toArray)
    GraftMor.splitByProfile(ps.toBatch.planInputPartitions(), specs)
  }

  override def createReaderFactory(): PartitionReaderFactory = batchFactory

  override def commit(end: V2Offset): Unit = {
    val v = end.asInstanceOf[GraftVersionOffset].version
    if (v >= 1L) pinFloor(v)
  }

  override def stop(): Unit = ()
}

object GraftMicroBatchStream {
  /** How long an IDLE stream lets its retention pin's mtime age before
    * `latestOffset` re-touches it. One tiny file rewrite per interval
    * per stream; must sit comfortably under any vacuum `pinMaxAgeMs`
    * (default 7 d) — an hour leaves ~168 refreshes of margin.
    */
  @volatile var pinRefreshMs: Long = 3600 * 1000L
}

private[sources] object EmptyReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    throw new IllegalStateException("empty batch planned no partitions")
}

/** Per-batch reader: the delegate parquet reader (rows in the batch's
  * committed schema), minus the applicable equality-delete keys, then
  * a codegen'd cast/projection to the PINNED stream schema (widening
  * evolution: the stream keeps serving the shape it started with; a
  * pinned column a batch's schema lacks serves NULL).
  */
private[sources] class GraftStreamReaderFactory(
    delegate: PartitionReaderFactory, readSchema: StructType,
    pinned: StructType, specs: Array[GraftDeleteSpec])
    extends PartitionReaderFactory {

  override def supportColumnarReads(p: InputPartition): Boolean = false

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case GraftMorPartition(inner, applicable) =>
        val lower = readSchema.fields.map(_.name.toLowerCase)
          .zipWithIndex.toMap
        val rdts = readSchema.fields.map(_.dataType)
        val exprs: Seq[Expression] = pinned.fields.toSeq.map { f =>
          lower.get(f.name.toLowerCase) match {
            case Some(i) => Cast(
              BoundReference(i, rdts(i), nullable = true), f.dataType,
              Some("UTC"))
            case None => Literal(null, f.dataType)
          }
        }
        new GraftMor.FilteringReader(delegate.createReader(inner),
            readSchema, applicable, specs) {
          private lazy val project = UnsafeProjection.create(exprs)
          override def get(): InternalRow = project(cur)
        }
      case other => throw new IllegalStateException(
        s"unexpected partition type: ${other.getClass}")
    }
}
