package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.SaveMode

/** DataSourceV2 READ connector for [[SnapshotTable]] — the SQL-first
  * door into the snapshot format:
  *
  * {{{
  * spark.read.format("graft-snapshot").load("/data/events")
  * spark.read.format("graft-snapshot")
  *   .option("versionAsOf", 3).load("/data/events")       // time travel
  * spark.read.format("graft-snapshot")
  *   .option("timestampAsOf", epochMs).load("/data/events") // by wall-clock
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
    with CreatableRelationProvider {

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
    // ErrorIfExists/Ignore must decide existence ATOMICALLY with the
    // commit — a separate pre-read would let two racing default-mode
    // writers both pass the check and both land. Committing with
    // expectedBase = 0 makes the claim itself the existence test:
    // exactly one racer takes v1, the loser gets the conditional-
    // commit signal and resolves it per its mode's semantics.
    def createOnly(): Unit =
      try SnapshotTable.commit(spark, root, data, statsCols,
        expectedBase = Some(0L), ledger = ledger)
      catch {
        case e: ConcurrentCommitException =>
          if (mode == SaveMode.ErrorIfExists)
            throw new IllegalStateException(
              s"$root already holds a committed snapshot: use " +
                "mode(\"append\") or mode(\"overwrite\")", e)
        // Ignore: someone else's snapshot exists — the mode's no-op
      }
    mode match {
      case SaveMode.Append =>
        SnapshotTable.append(spark, root, data, statsCols, ledger)
      case SaveMode.Overwrite =>
        SnapshotTable.commit(spark, root, data, statsCols, ledger = ledger)
      case SaveMode.ErrorIfExists | SaveMode.Ignore => createOnly()
    }
    new BaseRelation {
      override def sqlContext: SQLContext = sqlContext0
      override def schema: StructType = data.schema
      private def sqlContext0 = spark.sqlContext
    }
  }

  // ---------------------------------------------------------------- //
  // Streaming: the table AS A STREAM (`spark.readStream.format(...)`) //
  // is the DataSourceV2 micro-batch path — the tables below advertise //
  // MICRO_BATCH_READ and their scans answer `toMicroBatchStream` with //
  // [[GraftMicroBatchStream]] (version offsets, paced catch-up,       //
  // persisted pacing mark, retention pins; contract documented there) //
  // ---------------------------------------------------------------- //

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
                              deletes: Seq[SnapshotTable.DeleteFileInfo],
                              stats: Map[String, Map[String, (Long, Long)]])
  @volatile private var pinned: Option[Resolved] = None
  // the RAW option key the pin was computed from — the cache must hit
  // before any re-resolution (versionAt, currentVersion) runs, else a
  // timestampAsOf load pays the timestamp sweep twice and a concurrent
  // vacuum between the calls could even resolve a different version
  // than the pinned one
  @volatile private var pinnedKey: Option[(String, String, String)] = None

  private def resolve(options: CaseInsensitiveStringMap): Resolved = {
    val spark = SparkSession.active
    val root = tableRoot(options)
    val key = (root,
      Option(options.get("versionAsOf")).getOrElse(""),
      Option(options.get("timestampAsOf")).getOrElse(""))
    pinned match {
      case Some(r) if pinnedKey.contains(key) =>
        r // same load: reuse the single resolution
      case _ =>
        // time travel: by version, or by wall-clock through the
        // manifests' #ts headers (`timestampAsOf` = epoch millis) —
        // resolved to a version HERE so the pin covers it too
        val versionOpt = Option(options.get("versionAsOf")).map(_.toLong)
          .orElse(Option(options.get("timestampAsOf")).map(ts =>
            SnapshotTable.versionAt(spark, root, ts.toLong)))
        val cur = SnapshotTable.currentVersion(spark, root)
        val r =
          if (cur == 0L) {
            // no committed snapshot: legal for the WRITE flow (Spark
            // resolves the provider's table before routing the write;
            // mode("append") then CREATES the table) — a READ of this
            // resolution fails loudly at scan construction instead
            require(versionOpt.forall(_ <= 0L),
              s"$root has no committed snapshot to time-travel into")
            Resolved(root, 0L, Nil, StructType(Nil), Nil, Map.empty)
          } else {
            val v = versionOpt.filter(_ > 0L).getOrElse(cur)
            // entries, not just paths: the per-file stat envelopes ride
            // into the scan builders, which prune the file list against
            // pushed filters before parquet ever sees it (GraftPrune)
            val entries = SnapshotTable.snapshotEntries(spark, root, v)
            val files = entries.map(e => s"$root/${e.path}")
            val stats = entries.map(e => s"$root/${e.path}" -> e.stats).toMap
            // pre-#schema-header manifests (none written since r11) fall
            // back to footer inference over the committed file list
            val schema = SnapshotTable.snapshotSchema(spark, root, v)
              .getOrElse(spark.read.parquet(files: _*).schema)
            Resolved(root, v, files, schema,
              SnapshotTable.deleteFileInfos(spark, root, v), stats)
          }
        pinned = Some(r)
        pinnedKey = Some(key)
        r
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val s = resolve(options).schema
    // readChangeFeed widens the surface by the CDF columns — the
    // streaming rows carry _change_type + _commit_version
    if (GraftCdf.requested(options)) GraftCdf.schemaOf(s) else s
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val spark = SparkSession.active
    val r = resolve(options)
    // ONE-LOAD CONTRACT, enforced: the pin exists to make the
    // inferSchema → getTable pair of THIS load resolve once; clearing
    // it here means a provider instance reused for a second load of
    // the same (unversioned) path re-resolves fresh instead of
    // silently re-serving the first load's snapshot
    pinned = None
    pinnedKey = None
    val name = s"graft-snapshot ${r.root}@v${r.version}"
    val inputs = GraftScanInputs(spark, name, r.schema, r.files, r.stats)
    // the CATALOG door opts its tables into SQL DML (INSERT riding the
    // commit protocol via V1_BATCH_WRITE); path-based loads stay
    // read-only so df.write.save(root) keeps its spec-pinned SaveMode
    // semantics through the V1 createRelation seam
    val insertable = options.getBoolean("__graft_insertable", false)
    if (GraftCdf.requested(options) && r.version > 0L)
      // the change feed re-resolves each micro-batch from manifests;
      // load-time deletes are immaterial here (they emit as
      // retractions in their own versions)
      new GraftCdfTable(name, r.root, r.schema)
    else if (r.version == 0L)
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
      new GraftReadTable(name, r.root, schema, Some(inputs), insertable)
    else {
      // merge-on-read through SQL. Within the ceiling the delete keys
      // resolve to executor-shippable specs (GraftDeleteSpec, sized by
      // the manifest-certified backlog); PAST it the table is a marker
      // that either rewrites to the Scala door's shuffled anti-join
      // (GraftSnapshotExtensions registered) or refuses loudly with
      // every remedy named — never an executor OOM.
      val backlog = r.deletes.map(_.rows).sum
      val cap = math.min(SnapshotTable.deleteBroadcastMaxRows,
        SnapshotTable.deleteSpecMaxRows)
      if (backlog > cap)
        new GraftMorFallbackTable(name, r.root, r.version, r.schema,
          backlog, cap, insertable)
      else
        new GraftMorTable(name, r.root, inputs,
          GraftDeleteSpec.resolve(spark, r.root, r.version, r.schema,
            r.deletes), insertable)
    }
  }

  override def supportsExternalMetadata(): Boolean = false
}

