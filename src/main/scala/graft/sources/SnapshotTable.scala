package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal manifest-of-files table format: ATOMIC snapshot commits
  * over plain parquet — the missing piece every directory-swap helper
  * in [[Layout]] documents ("snapshot isolation needs a table format's
  * commit"). The protocol is the public Iceberg/Delta core in its
  * smallest honest form:
  *
  * {{{
  * table/
  *   data-00001/part-*.parquet      immutable once committed
  *   data-00002/part-*.parquet
  *   _graft_meta/manifest-00001     one relative file path per line
  *   _graft_meta/manifest-00002
  *   _graft_meta/HEAD               contents: "manifest-00002"
  * }}}
  *
  * Readers resolve HEAD → manifest → exact file list; writers stage
  * data files, write the next manifest, then ATOMICALLY repoint HEAD
  * (single-file rename — atomic on POSIX and HDFS). Consequences:
  *  - NO vanish window: a concurrent reader sees the old snapshot or
  *    the new one, never a half-state — data files are immutable and
  *    never deleted by a commit;
  *  - crash ANYWHERE before the HEAD rename leaves the table exactly
  *    at the previous snapshot (orphan data/manifest files are inert
  *    garbage, reclaimed by [[vacuum]]);
  *  - time travel for free: any retained manifest can be read.
  *
  * At 100 TB this is also the LISTING fix: a snapshot read opens one
  * HEAD + one manifest instead of recursively listing millions of
  * files. Out of scope, honestly: concurrent WRITERS need a
  * compare-and-swap on HEAD (object stores offer conditional puts; a
  * posix rename is last-writer-wins), and row-level deletes need
  * delete files — this format does whole-snapshot replaces, which is
  * exactly what [[Layout.compact]] and full-partition rewrites emit.
  */
object SnapshotTable {

  private val MetaDir = "_graft_meta"
  private val Head = "HEAD"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hp(parts: String*) =
    new org.apache.hadoop.fs.Path(parts.mkString("/"))

  /** Current committed version, 0 when the table has no snapshot. */
  def currentVersion(spark: SparkSession, table: String): Long = {
    val f = fs(spark, table)
    val head = hp(table, MetaDir, Head)
    if (!f.exists(head)) return 0L
    val in = f.open(head)
    val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    name.stripPrefix("manifest-").toLong
  }

  /** One manifest entry: a relative file path plus per-column [min,
    * max] envelopes for the columns [[commit]] recorded stats on. A
    * column absent from the map has no envelope in this file (all-null
    * there, or never recorded) and can never be pruned on.
    */
  case class ManifestEntry(path: String, stats: Map[String, (Long, Long)])

  /** Manifest entries of snapshot `version` (default: HEAD). Line
    * format: `relpath` optionally followed by `\tcol=lo..hi` per stats
    * column — written at commit time, powering [[readPruned]]'s file
    * skipping.
    */
  def snapshotEntries(spark: SparkSession, table: String,
                      version: Long = 0L): Seq[ManifestEntry] = {
    val v = if (version > 0L) version else currentVersion(spark, table)
    require(v > 0L, s"$table has no committed snapshot")
    val f = fs(spark, table)
    val in = f.open(hp(table, MetaDir, f"manifest-$v%05d"))
    val StatTok = "([^=]+)=(-?[0-9]+)\\.\\.(-?[0-9]+)".r
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).map { line =>
        val toks = line.split("\t")
        val stats = toks.tail.map {
          case StatTok(c, lo, hi) => c -> (lo.toLong, hi.toLong)
          case other => throw new IllegalStateException(
            s"malformed manifest stat token: $other")
        }.toMap
        ManifestEntry(toks.head, stats)
      }.toList
    finally in.close()
  }

  /** Relative data-file paths of snapshot `version` (default: HEAD). */
  def snapshotFiles(spark: SparkSession, table: String,
                    version: Long = 0L): Seq[String] =
    snapshotEntries(spark, table, version).map(_.path)

  /** Read a snapshot (default: the current one) — the exact committed
    * file list, no directory listing of the data tree.
    */
  def read(spark: SparkSession, table: String, version: Long = 0L): DataFrame = {
    val files = snapshotFiles(spark, table, version).map(rel => s"$table/$rel")
    spark.read.parquet(files: _*)
  }

  /** Commit `df` as the table's next snapshot (whole-snapshot replace).
    * Steps: write data files to a fresh `data-<next>` dir, write
    * `manifest-<next>` listing exactly those files, then atomically
    * rename a temp HEAD over HEAD. Returns the committed version.
    *
    * `statsCols` (LONG-castable columns): record each file's [min,
    * max] envelope per column in the manifest — [[readPruned]] then
    * skips whole files from the MANIFEST, before any footer is opened.
    * This is the listing-level analog of parquet row-group pruning,
    * and it is what makes a clustered write pay at 100 TB: sort by the
    * column (one dim) or Z-ORDER by all of them
    * ([[Layout.zorderWrite]]) so EVERY recorded column's per-file
    * envelope is narrow — stats over an unclustered column cover the
    * full range in every file and prune nothing. Costs ONE aggregate
    * over the just-written files at commit time regardless of column
    * count.
    */
  def commit(spark: SparkSession, table: String, df: DataFrame,
             statsCols: Seq[String] = Nil): Long = {
    val f = fs(spark, table)
    // next version must clear HEAD AND any orphan artifacts a crashed
    // writer left behind (a staged data dir / manifest whose HEAD swap
    // never happened) — colliding with an orphan would fail the write
    // or, worse, commit a manifest listing someone else's files
    def maxWith(prefix: String, dir: org.apache.hadoop.fs.Path): Long =
      if (!f.exists(dir)) 0L
      else f.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith(prefix))
        .map(n => scala.util.Try(n.stripPrefix(prefix).takeWhile(_.isDigit).toLong)
          .getOrElse(0L))
        .foldLeft(0L)(math.max)
    val next = Seq(
      currentVersion(spark, table),
      maxWith("data-", hp(table)),
      maxWith("manifest-", hp(table, MetaDir))).max + 1L
    val dataDir = f"data-$next%05d"
    df.write.parquet(s"$table/$dataDir")
    val files = f.listStatus(hp(table, dataDir))
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => s"$dataDir/${s.getPath.getName}").sorted
    require(files.nonEmpty, "refusing to commit an empty snapshot")
    val lines =
      if (statsCols.isEmpty) files
      else {
        import org.apache.spark.sql.functions.{col, input_file_name, max, min}
        val aggs = statsCols.flatMap(c => Seq(
          min(col(c).cast("long")), max(col(c).cast("long"))))
        val stats = spark.read.parquet(s"$table/$dataDir")
          .groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val name = r.getString(0).split("/").takeRight(1).head
            val envs = statsCols.zipWithIndex.flatMap { case (c, i) =>
              // all-null column in this file: no envelope token
              if (r.isNullAt(1 + 2 * i)) None
              else Some(s"$c=${r.getLong(1 + 2 * i)}..${r.getLong(2 + 2 * i)}")
            }
            name -> envs
          }.toMap
        files.map { rel =>
          val name = rel.split("/").last
          (rel +: stats.getOrElse(name, Nil)).mkString("\t")
        }
      }
    f.mkdirs(hp(table, MetaDir))
    val manifest = hp(table, MetaDir, f"manifest-$next%05d")
    val mOut = f.create(manifest, false) // manifests are immutable: no overwrite
    try mOut.write(lines.mkString("\n").getBytes("UTF-8")) finally mOut.close()
    // the COMMIT POINT: single-file rename over HEAD — readers resolve
    // entirely the old snapshot or entirely the new one
    val tmp = hp(table, MetaDir, s"$Head.tmp-$next")
    val tOut = f.create(tmp, true)
    try tOut.write(f"manifest-$next%05d".getBytes("UTF-8")) finally tOut.close()
    val head = hp(table, MetaDir, Head)
    if (!f.rename(tmp, head)) { // HDFS/posix semantics: replace needs the dest gone
      f.delete(head, false)
      require(f.rename(tmp, head), s"HEAD swap failed for $table v$next")
    }
    next
  }

  /** Delete data files and manifests no snapshot within `retain`
    * versions of HEAD references — the GC that makes immutable commits
    * affordable, and the sweeper for artifacts crashed commits orphan.
    * `retain = 1` keeps only the current snapshot; `retain = 2` keeps
    * one step of time travel; never touches the CURRENT snapshot's
    * files. Single-writer caveat (same as [[commit]]): run vacuum only
    * when no writer is mid-stage — an uncommitted data dir is
    * indistinguishable from a crashed one and will be reclaimed.
    */
  def vacuum(spark: SparkSession, table: String, retain: Int = 1): Long = {
    require(retain >= 1, "must retain at least the current snapshot")
    val f = fs(spark, table)
    val cur = currentVersion(spark, table)
    if (cur == 0L) return 0L
    val keepVersions = (math.max(1L, cur - retain + 1L) to cur).toSet
    val referenced = keepVersions.flatMap(v => snapshotFiles(spark, table, v))
    var removed = 0L
    // sweep data dirs not referenced by any retained manifest
    f.listStatus(hp(table)).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("data-")).foreach { d =>
        val keep = referenced.exists(_.startsWith(s"$d/"))
        if (!keep) { f.delete(hp(table, d), true); removed += 1 }
      }
    // and manifests older than the retention window (HEAD untouched)
    f.listStatus(hp(table, MetaDir))
      .map(_.getPath.getName).filter(_.startsWith("manifest-")).foreach { m =>
        val v = m.stripPrefix("manifest-").toLong
        if (!keepVersions.contains(v)) { f.delete(hp(table, MetaDir, m), false); removed += 1 }
      }
    removed
  }

  /** Read only the files whose committed envelopes intersect EVERY
    * given `(column, lo, hi)` range — conjunctive file skipping decided
    * from the MANIFEST alone, before any data file or footer is opened.
    * A file without an envelope for some predicate column is
    * conservatively kept. The returned frame still carries the residual
    * row filters: envelopes bound files, they do not filter rows. With
    * a Z-ordered write and stats on every clustered dim, a box query
    * prunes on ALL dims at once — the manifest-resolution payoff of
    * [[Layout.zorderWrite]]'s per-file hyper-rectangles.
    */
  def readPruned(spark: SparkSession, table: String,
                 preds: Seq[(String, Long, Long)],
                 version: Long = 0L): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(preds.nonEmpty, "readPruned needs at least one range predicate")
    val entries = snapshotEntries(spark, table, version)
    val keep = entries.filter { e =>
      preds.forall { case (c, lo, hi) =>
        e.stats.get(c).forall { case (flo, fhi) => flo <= hi && fhi >= lo }
      }
    }
    def residual(df: DataFrame): DataFrame =
      preds.foldLeft(df) { case (d, (c, lo, hi)) =>
        d.filter(col(c).cast("long").between(lo, hi))
      }
    if (keep.isEmpty) // empty relation WITH the right schema
      return residual(read(spark, table, version)).limit(0)
    residual(spark.read.parquet(keep.map(e => s"$table/${e.path}"): _*))
  }

  /** Single-column convenience overload of [[readPruned]]. */
  def readPruned(spark: SparkSession, table: String, statsCol: String,
                 lo: Long, hi: Long): DataFrame =
    readPruned(spark, table, Seq((statsCol, lo, hi)))

  /** SQL MERGE into a snapshot table: [[Layout.merged]] over the
    * current snapshot, committed as the next version — the upsert with
    * ATOMIC reader visibility that [[Layout.mergeDatePartitioned]]'s
    * rename swap cannot give (there a cross-partition reader can see a
    * mixed version mid-merge; here it sees the whole pre-merge or the
    * whole post-merge snapshot). Whole-snapshot rewrite per merge is
    * the honest price of this minimal format — partition-scoped
    * manifests (Iceberg's next layer) are the scale extension.
    */
  def merge(spark: SparkSession, table: String, changes: DataFrame,
            keys: Seq[String], deleteCol: Option[String] = None,
            matchedCond: Option[org.apache.spark.sql.Column] = None): Long =
    commit(spark, table,
      Layout.merged(read(spark, table), changes, keys, deleteCol, matchedCond))

  /** [[Layout.compact]] through the snapshot commit: rewrite the
    * current snapshot's rows into ~targetBytes files and commit them
    * as the next version — readers NEVER see a vanish window (contrast
    * [[Layout.compactInPlace]]'s two-rename gap), and the old files
    * stay readable until [[vacuum]].
    */
  def compactSnapshot(spark: SparkSession, table: String,
                      targetBytes: Long = 128L << 20): Long = {
    val cur = read(spark, table)
    val referenced = snapshotFiles(spark, table)
    val f = fs(spark, table)
    val onDisk = referenced.map(rel =>
      f.getFileStatus(hp(table, rel)).getLen).sum
    val nFiles = math.max(1L, (onDisk + targetBytes - 1) / targetBytes)
    commit(spark, table, cur.coalesce(nFiles.toInt))
  }
}
