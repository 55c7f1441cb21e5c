package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.execution.streaming.{Offset => SourceOffset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.SaveMode

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
  * read through a MERGE-ON-READ scan ([[GraftMorTable]]): the same
  * stock parquet machinery with the delete keys applied inside the
  * partition readers — the deleteWhere-then-compact steady state reads
  * identically through the SQL and Scala doors (spec-pinned parity),
  * with filter pushdown intact. Both resolutions happen exactly ONCE
  * per load (`inferSchema` pins, `getTable` reuses), so a concurrent
  * commit can never pair one version's schema with another's files.
  */
class GraftSnapshotSource extends TableProvider with DataSourceRegister
    with StreamSourceProvider with CreatableRelationProvider {

  override def shortName(): String = "graft-snapshot"

  // ---------------------------------------------------------------- //
  // Writes: `df.write.format("graft-snapshot")` — the SQL-first door  //
  // OUT, riding the same claim + ledger machinery as the Scala API    //
  // ---------------------------------------------------------------- //

  /** Batch write path (Spark routes a TableProvider without
    * BATCH_WRITE capability to this V1 seam — deliberately: the V1
    * surface hands over the WHOLE DataFrame, so the write IS
    * [[SnapshotTable.append]]/[[SnapshotTable.commit]] with every
    * protocol guarantee intact — claim-serialized concurrent writers,
    * loud schema evolution, the exactly-once sink ledger — rather than
    * a re-implementation of them behind per-task writer commits).
    *
    *  - mode("append")    → [[SnapshotTable.append]] (fast append;
    *    creates the table at v1 when absent)
    *  - mode("overwrite") → [[SnapshotTable.commit]] (whole-snapshot
    *    replace; ledger headers carry forward)
    *  - mode("errorifexists") (default) → append only if no snapshot
    *    exists yet, else error
    *  - mode("ignore")    → no-op if a snapshot exists
    *
    * Options: `statsCols` (comma-separated) records per-file envelopes
    * for manifest pruning; `sinkId` + `batchId` thread the exactly-once
    * ledger through `foreachBatch`:
    * {{{
    * .foreachBatch { (df, id) => df.write.format("graft-snapshot")
    *   .option("sinkId", ckpt).option("batchId", id)
    *   .mode("append").save(root) }
    * }}}
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    def opt(k: String): Option[String] =
      parameters.get(k).orElse(parameters.get(k.toLowerCase))
    val root = opt("path").getOrElse(throw new IllegalArgumentException(
      "graft-snapshot write needs .save(<table root>) or option(\"path\", ...)"))
    val statsCols = opt("statsCols").map(_.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val ledger = for { s <- opt("sinkId"); b <- opt("batchId") }
      yield (s, b.toLong)
    val exists = SnapshotTable.currentVersion(spark, root) > 0L
    mode match {
      case SaveMode.Append =>
        SnapshotTable.append(spark, root, data, statsCols, ledger)
      case SaveMode.Overwrite =>
        SnapshotTable.commit(spark, root, data, statsCols, ledger = ledger)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"$root already holds a committed snapshot " +
            s"(v${SnapshotTable.currentVersion(spark, root)}): use " +
            "mode(\"append\") or mode(\"overwrite\")")
        SnapshotTable.append(spark, root, data, statsCols, ledger)
      case SaveMode.Ignore =>
        if (!exists) SnapshotTable.append(spark, root, data, statsCols, ledger)
    }
    new BaseRelation {
      override def sqlContext: SQLContext = sqlContext0
      override def schema: StructType = data.schema
      private def sqlContext0 = spark.sqlContext
    }
  }

  // ---------------------------------------------------------------- //
  // Streaming: the table AS A STREAM (`spark.readStream.format(...)`) //
  // ---------------------------------------------------------------- //

  /** Offsets are SNAPSHOT VERSIONS (delivered-through, inclusive) and a
    * micro-batch (start, end] is exactly
    * [[SnapshotTable.readAdded]](start, end) — the manifest diff, so a
    * batch costs the files added in that version range and nothing
    * else. `option("startingVersion", ...)`:
    *  - absent (default): the first batch is the FULL current snapshot,
    *    then increments — the bootstrap-a-downstream shape;
    *  - `"latest"`: only changes committed after the stream starts;
    *  - `<v>`: changes after version v (v itself excluded).
    * `option("maxVersionsPerTrigger", n)` paces consumption: each
    * micro-batch advances at most n versions past the served
    * high-water mark, so a consumer restarted after a long outage
    * drains its backlog in bounded batches instead of one giant read.
    * Replays are exactly-once by construction: getBatch(start, end] is
    * deterministic while the versions are retained — VACUUM RETENTION
    * must cover the consumer's maximum lag, else the replay fails
    * loudly (never silently skips). The schema is pinned at stream
    * start; each batch casts/projects to it, so later appends with
    * widened or added columns keep serving the pinned shape (restart
    * the stream to pick up an evolved schema).
    */
  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-snapshot stream needs .load(<table root>) or option(\"path\", ...)"))
    require(SnapshotTable.currentVersion(spark, root) > 0L,
      s"$root has no committed snapshot")
    (shortName(), schema.getOrElse(
      SnapshotTable.snapshotSchema(spark, root)
        .getOrElse(SnapshotTable.read(spark, root).schema)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val root = parameters("path")
    val pinned = sourceSchema(sqlContext, schema, providerName, parameters)._2
    val startAfter = parameters.get("startingversion")
      .orElse(parameters.get("startingVersion")) match {
      case Some("latest") => SnapshotTable.currentVersion(spark, root)
      case Some(v) => v.toLong
      case None => 0L // version 0 = nothing delivered yet → full snapshot
    }
    val maxPerTrigger = parameters.get("maxversionspertrigger")
      .orElse(parameters.get("maxVersionsPerTrigger")).map(_.toLong)
    maxPerTrigger.foreach(m => require(m >= 1, "maxVersionsPerTrigger >= 1"))
    new GraftSnapshotStreamSource(spark, root, pinned, startAfter,
      maxPerTrigger, Some(metadataPath))
  }

  private def tableRoot(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path"))
    require(p.nonEmpty && p.get.nonEmpty,
      "graft-snapshot needs the table root: .load(<path>) or .option(\"path\", ...)")
    p.get
  }

  /** One read's fully-resolved snapshot state, computed ONCE per load:
    * Spark calls `inferSchema` then `getTable` back-to-back on the same
    * provider instance, and resolving `currentVersion` independently in
    * each opened a race — a commit landing between the calls could pair
    * version-N's schema with version-N+1's file list (and a deleteWhere
    * landing there escaped the delete handling entirely). `inferSchema`
    * resolves and PINS; `getTable` reuses the pinned state, so a read
    * is one consistent (version, files, schema, deletes) regardless of
    * concurrent writers.
    */
  private case class Resolved(root: String, version: Long,
                              files: Seq[String], schema: StructType,
                              deletes: Seq[SnapshotTable.DeleteFileInfo])
  @volatile private var pinned: Option[Resolved] = None

  private def resolve(options: CaseInsensitiveStringMap): Resolved = {
    val spark = SparkSession.active
    val root = tableRoot(options)
    val versionOpt = Option(options.get("versionAsOf")).map(_.toLong)
    pinned match {
      case Some(r) if r.root == root && versionOpt.forall(_ == r.version) =>
        r // same load: reuse the single resolution
      case _ =>
        val cur = SnapshotTable.currentVersion(spark, root)
        val r =
          if (cur == 0L) {
            // no committed snapshot: legal for the WRITE flow (Spark
            // resolves the provider's table before routing the write;
            // mode("append") then CREATES the table) — a READ of this
            // resolution fails loudly at scan construction instead
            require(versionOpt.forall(_ <= 0L),
              s"$root has no committed snapshot to time-travel into")
            Resolved(root, 0L, Nil, StructType(Nil), Nil)
          } else {
            val v = versionOpt.filter(_ > 0L).getOrElse(cur)
            val files = SnapshotTable.snapshotFiles(spark, root, v)
              .map(rel => s"$root/$rel")
            // pre-#schema-header manifests (none written since r11) fall
            // back to footer inference over the committed file list
            val schema = SnapshotTable.snapshotSchema(spark, root, v)
              .getOrElse(spark.read.parquet(files: _*).schema)
            Resolved(root, v, files, schema,
              SnapshotTable.deleteFileInfos(spark, root, v))
          }
        pinned = Some(r)
        r
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    resolve(options).schema

  /** Resolve a delete file's key rows to an executor-shippable
    * [[GraftDeleteSpec]]: the key columns CAST to the table's column
    * types (the anti-join the Scala reader plans would insert the same
    * casts), collected as internal rows. Driver-side and bounded: the
    * manifest-certified backlog was size-checked before this runs.
    */
  private def deleteSpecs(spark: SparkSession, r: Resolved): Seq[GraftDeleteSpec] = {
    import org.apache.spark.sql.functions.col
    r.deletes.map { d =>
      val casts = d.cols.map { c =>
        val t = r.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
          throw new IllegalStateException(
            s"delete key column '$c' missing from ${r.root} v${r.version} schema"))
        col(c).cast(t.dataType)
      }
      val df = spark.read.parquet(s"${r.root}/${d.path}").select(casts: _*)
      val dts = df.schema.fields.map(_.dataType)
      // copy() per row: the internal-row iterator REUSES its buffer, so
      // a bare collect() would yield N references to the last key
      val keys = df.queryExecution.toRdd.map(_.copy()).collect().map { row =>
        dts.indices.map(i => row.get(i, dts(i))): Seq[Any]
      }.toSet
      GraftDeleteSpec(d.cols, d.appliesBelow, keys)
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val spark = SparkSession.active
    val r = resolve(options)
    val name = s"graft-snapshot ${r.root}@v${r.version}"
    if (r.version == 0L)
      // write-flow resolution of a not-yet-existing table: reads fail
      // loudly at scan construction; writes never reach this table
      // (no BATCH_WRITE capability routes them to [[createRelation]])
      new GraftReadTable(name, r.root, StructType(Nil), None)
    else if (r.deletes.isEmpty)
      // the delete-free fast path: the stock vectorized parquet SCAN
      // over the committed file list — but wrapped READ-ONLY: the raw
      // ParquetTable is SupportsWrite, and exposing that would let
      // `df.write` bypass the manifest commit protocol entirely (and
      // corrupt the table); without BATCH_WRITE, Spark routes writes
      // to the V1 seam ([[createRelation]]) = the real commit path
      new GraftReadTable(name, r.root, schema,
        Some(ParquetTable(name, spark, options, r.files, Some(schema),
          classOf[ParquetFileFormat])))
    else {
      // merge-on-read through SQL: key sets ship with the reader
      // factory, so the certified backlog must fit the same bound the
      // Scala reader's broadcast uses — past it, the remedies are the
      // Scala door (which degrades to a shuffled anti-join) or a
      // compaction (which purges the backlog physically)
      val backlog = r.deletes.map(_.rows).sum
      if (backlog > SnapshotTable.deleteBroadcastMaxRows)
        throw new UnsupportedOperationException(
          s"${r.root} v${r.version}: $backlog outstanding delete-key rows " +
            s"exceed deleteBroadcastMaxRows=" +
            s"${SnapshotTable.deleteBroadcastMaxRows} — compact the table " +
            "(SnapshotTable.compactScoped/compactSnapshot purges deletes " +
            "physically) or read via SnapshotTable.read, whose anti-join " +
            "shuffles instead")
      new GraftMorTable(name, spark, options, r.files, schema,
        deleteSpecs(spark, r))
    }
  }

  override def supportsExternalMetadata(): Boolean = false
}

/** The snapshot table as a structured-streaming SOURCE (see
  * [[GraftSnapshotSource.sourceSchema]] for the contract): offsets are
  * versions, a micro-batch is the manifest diff between two of them,
  * resolved delete-aware by [[SnapshotTable.readAdded]].
  */
private[sources] class GraftSnapshotStreamSource(
    spark: SparkSession, table: String, pinned: StructType,
    startAfter: Long, maxVersionsPerTrigger: Option[Long] = None,
    metadataPath: Option[String] = None)
    extends Source {

  import org.apache.spark.sql.functions.col

  override def schema: StructType = pinned

  private def versionOf(o: SourceOffset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong // SerializedOffset after restart
  }

  private val mfs = metadataPath.map(mp =>
    new org.apache.hadoop.fs.Path(mp)
      .getFileSystem(spark.sparkContext.hadoopConfiguration))
  private val hwmFile = metadataPath.map(mp =>
    new org.apache.hadoop.fs.Path(mp, "graft-served-hwm"))

  /** The persisted high-water mark (see [[served]]), recovered at
    * restart. Without persistence, a CLEAN restart (last batch
    * committed) with `maxVersionsPerTrigger` set would re-cap the next
    * offset BELOW the checkpoint's committed offset — Spark's V1
    * recovery only re-runs getBatch for a PENDING batch, so `served`
    * would restart at `startAfter` and already-delivered version
    * ranges would be re-served: duplicate redelivery. The mark is
    * advisory pacing state (the checkpoint's offset log stays the
    * source of truth for delivery), so a torn read just falls back to
    * `startAfter` — the worst case is the pre-persistence behavior,
    * never data loss.
    */
  private def readHwm(): Long = (for {
    f <- mfs; p <- hwmFile if f.exists(p)
  } yield {
    val in = f.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    scala.util.Try(txt.trim.toLong).getOrElse(startAfter)
  }).getOrElse(startAfter)

  private def writeHwm(v: Long): Unit = for { f <- mfs; p <- hwmFile } {
    val out = f.create(p, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** ADMISSION CONTROL high-water mark: the highest version already
    * handed to a batch, persisted under the source's metadataPath (the
    * standard V1 pattern) so a restart — clean OR mid-batch — never
    * re-caps below what the checkpoint holds. `maxVersionsPerTrigger`
    * then bounds each micro-batch to that many versions past it — a
    * consumer restarted after a long outage drains a 10,000-version
    * backlog in paced batches instead of one giant catch-up read.
    */
  @volatile private var served: Long = math.max(startAfter, readHwm())

  override def getOffset: Option[SourceOffset] = {
    val cur = SnapshotTable.currentVersion(spark, table)
    val capped = maxVersionsPerTrigger match {
      case Some(m) => math.min(cur, math.max(served, startAfter) + m)
      case None => cur
    }
    if (capped <= startAfter && startAfter > 0L) Some(LongOffset(startAfter))
    else if (cur == 0L) None
    else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[SourceOffset],
                        end: SourceOffset): DataFrame = {
    val to = versionOf(end)
    val from = start.map(versionOf).getOrElse(startAfter)
    if (to > served) { served = to; writeHwm(to) }
    // retention pin at this batch's REPLAY FLOOR: `start` is durable by
    // the time Spark constructs (start, end] (batch N+1 only runs after
    // batch N's commit log entry), and a retry of THIS batch re-reads
    // from it; the bootstrap batch (from = 0) reads the whole snapshot
    // at `to`, so `to` is its floor. Source.commit() raises the pin one
    // batch later — this is the one that must exist BEFORE a vacuum can
    // run between the first batch and the first commit callback.
    val floor = if (from >= 1L) from else to
    if (floor >= 1L) metadataPath.foreach(mp =>
      SnapshotTable.pinVersion(spark, table, mp, floor))
    val batch =
      if (from >= to) SnapshotTable.read(spark, table, to).limit(0)
      else if (from == 0L) SnapshotTable.read(spark, table, to) // bootstrap
      else SnapshotTable.readAdded(spark, table, from, to)
    // serve the PINNED stream schema whatever the table evolved to,
    // streaming-flagged as MicroBatchExecution requires of V1 sources
    org.apache.spark.sql.GraftStreamShim.asStreaming(
      batch.select(pinned.fields.map(f => col(f.name).cast(f.dataType)).toSeq: _*))
  }

  /** RETENTION coordination: every committed offset refreshes this
    * consumer's pin on the table ([[SnapshotTable.pinVersion]], keyed
    * by the checkpoint's metadataPath), so a vacuum — however
    * aggressive its `retain` — keeps every manifest the replay window
    * (committed, current] needs. A consumer that dies stops
    * refreshing and its pin ages out under vacuum's `pinMaxAgeMs`;
    * the failure mode then degrades to today's loud replay error,
    * never a silent skip.
    */
  override def commit(end: SourceOffset): Unit = {
    val v = versionOf(end)
    if (v >= 1L) metadataPath.foreach(mp =>
      SnapshotTable.pinVersion(spark, table, mp, v))
  }

  override def stop(): Unit = ()
}
