package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The snapshot-commit contracts: atomic visibility (old snapshot or
  * new, never a half-state), crash-before-commit inertness, time
  * travel over retained manifests, vacuum safety, and the no-vanish
  * compaction path.
  */
class SnapshotTableSpec extends SparkSpec {

  private def mkTable(): String =
    Files.createTempDirectory("snap").toString + "/t"

  test("commit replaces the snapshot atomically; old files serve pinned readers until vacuum") {
    import spark.implicits._
    val t = mkTable()
    val v1 = SnapshotTable.commit(spark, t,
      (0 until 10).map(i => (i.toLong, "v1")).toDF("k", "tag"))
    assert(v1 == 1L && SnapshotTable.currentVersion(spark, t) == 1L)
    assert(SnapshotTable.read(spark, t).count() == 10)

    val v1Files = SnapshotTable.snapshotFiles(spark, t)
    val v2 = SnapshotTable.commit(spark, t,
      (0 until 25).map(i => (i.toLong, "v2")).toDF("k", "tag"))
    assert(v2 == 2L)
    // HEAD read sees only v2
    assert(SnapshotTable.read(spark, t).select("tag").distinct()
      .as[String].collect().toSeq == Seq("v2"))
    // a reader pinned to v1 (resolved its manifest before the commit)
    // still reads v1's files — commits delete NOTHING
    assert(spark.read.parquet(v1Files.map(f => s"$t/$f"): _*).count() == 10)
    assert(SnapshotTable.read(spark, t, version = 1L).count() == 10,
      "time travel over the retained manifest")

    // vacuum(retain=1) reclaims v1's data dir and manifest, keeps v2
    assert(SnapshotTable.vacuum(spark, t, retain = 1) >= 2L)
    assert(!new java.io.File(s"$t/data-00001").exists(), "v1 data reclaimed")
    assert(SnapshotTable.read(spark, t).count() == 25, "current snapshot intact")
    intercept[Exception] { SnapshotTable.snapshotFiles(spark, t, version = 1L) }
  }

  test("a crash BEFORE the HEAD swap is inert: readers stay on the old snapshot") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t, Seq((1L, "live")).toDF("k", "tag"))
    // simulate a writer that staged data + manifest, then died before
    // renaming HEAD: write the orphan artifacts by hand
    Seq((2L, "orphan")).toDF("k", "tag").write.parquet(s"$t/data-00002")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_graft_meta", "manifest-00002"),
      "data-00002/part-orphan.parquet".getBytes("UTF-8"))
    assert(SnapshotTable.currentVersion(spark, t) == 1L,
      "HEAD untouched -> table still at v1")
    assert(SnapshotTable.read(spark, t).select("tag").head().getString(0) == "live")
    // the next real commit supersedes the orphan version number safely
    val v = SnapshotTable.commit(spark, t, Seq((3L, "next")).toDF("k", "tag"))
    assert(v == 3L, s"orphan manifest occupies v2; the commit takes v3, got $v")
    assert(SnapshotTable.read(spark, t).select("tag").head().getString(0) == "next")
  }

  test("merge commits MERGE semantics as the next snapshot; pre-merge snapshot stays readable") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 10L).map(i => (i, s"old$i", false)).toDF("k", "v", "del"))
    val changes = Seq(
      (3L, "UPDATED", false),   // WHEN MATCHED UPDATE
      (42L, "INSERTED", false), // WHEN NOT MATCHED INSERT
      (5L, "", true),           // WHEN MATCHED AND del DELETE
      (99L, "", true))          // tombstone for an absent key: no-op
      .toDF("k", "v", "del")
    val v = SnapshotTable.merge(spark, t, changes, Seq("k"),
      deleteCol = Some("del"))
    assert(v == 2L)
    val got = SnapshotTable.read(spark, t).select("k", "v")
      .as[(Long, String)].collect().toMap
    assert(got(3L) == "UPDATED" && got(42L) == "INSERTED" &&
      !got.contains(5L) && !got.contains(99L) && got(0L) == "old0" &&
      got.size == 10, s"MERGE semantics over the snapshot: $got")
    // atomic visibility: the pre-merge snapshot is still fully readable
    assert(SnapshotTable.read(spark, t, version = 1L)
      .filter(col("k") === 5L).count() == 1)
  }

  test("manifest min/max envelopes skip whole files for a clustered column") {
    import spark.implicits._
    val t = mkTable()
    val rows = (0L until 1000L).map(i => (i, s"p$i"))
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "100")
    try SnapshotTable.commit(spark, t,
      rows.toDF("k", "v").repartitionByRange(4, col("k"))
        .sortWithinPartitions("k"),
      statsCols = Seq("k"))
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val entries = SnapshotTable.snapshotEntries(spark, t)
    assert(entries.size >= 8, s"need fragmentation, got ${entries.size} files")
    assert(entries.forall(_.stats.contains("k")), "every file carries its envelope")
    // a narrow range must intersect FEW files' envelopes
    val hit = entries.count(e => e.stats("k")._1 <= 160L && e.stats("k")._2 >= 140L)
    assert(hit < entries.size / 2,
      s"clustered write must localize the range: $hit of ${entries.size} files")
    // and the pruned read returns exactly the full-scan filter's rows
    val pruned = SnapshotTable.readPruned(spark, t, "k", 140L, 160L)
      .as[(Long, String)].collect().sorted.toSeq
    assert(pruned == rows.filter(r => r._1 >= 140 && r._1 <= 160),
      "file skipping must not change results")
    // disjoint range: zero files, empty result, schema intact
    val none = SnapshotTable.readPruned(spark, t, "k", 5000L, 6000L)
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "v"))
  }

  test("a Z-ordered commit prunes on EVERY clustered dim; a linear sort prunes only its own") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(4000)((rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong))
    val df = rows.toDF("x", "y")
    def zframe = {
      // the zorderWrite discipline inline (range-partition + sort by the
      // Morton value) so the commit sees Z-clustered partitions
      val z = graft.sources.Layout.zvalue(
        Seq((col("x"), 0L, 4095L), (col("y"), 0L, 4095L)), bits = 8)
      df.withColumn("__z", z).repartitionByRange(8, col("__z"))
        .sortWithinPartitions("__z").drop("__z")
    }
    def committed(frame: org.apache.spark.sql.DataFrame): String = {
      val t = mkTable()
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "250")
      try SnapshotTable.commit(spark, t, frame, statsCols = Seq("x", "y"))
      finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      t
    }
    val zt = committed(zframe)
    val lt = committed(df.repartitionByRange(8, col("x")).sortWithinPartitions("x"))
    def kept(t: String, preds: Seq[(String, Long, Long)]): Int =
      SnapshotTable.snapshotEntries(spark, t).count(e =>
        preds.forall { case (c, lo, hi) =>
          e.stats.get(c).forall { case (flo, fhi) => flo <= hi && fhi >= lo } })
    val box = Seq(("x", 1000L, 1400L), ("y", 1000L, 1400L))
    val zKept = kept(zt, box)
    val zTotal = SnapshotTable.snapshotEntries(spark, zt).size
    // the linear-sorted table prunes on x but keeps ~every file for a
    // y-only range; the z table prunes on BOTH
    val lYKept = kept(lt, Seq(("y", 1000L, 1400L)))
    val lTotal = SnapshotTable.snapshotEntries(spark, lt).size
    val zYKept = kept(zt, Seq(("y", 1000L, 1400L)))
    assert(lYKept == lTotal, s"linear sort cannot prune y: $lYKept/$lTotal")
    assert(zYKept < zTotal, s"z-order must prune y too: $zYKept/$zTotal")
    assert(zKept < zTotal / 2, s"box query must skip most z files: $zKept/$zTotal")
    // and the pruned box read is exact
    val got = SnapshotTable.readPruned(spark, zt, box)
      .as[(Long, Long)].collect().sorted.toSeq
    val exp = rows.filter(r => r._1 >= 1000 && r._1 <= 1400 &&
      r._2 >= 1000 && r._2 <= 1400).sorted
    assert(got == exp, "multi-dim file skipping must not change results")
  }

  test("compactSnapshot merges files with zero vanish window and content equality") {
    import spark.implicits._
    val t = mkTable()
    val rows = (0 until 40).map(i => (i.toLong, s"r$i"))
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "2")
    try SnapshotTable.commit(spark, t, rows.toDF("k", "v").repartition(4))
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val before = SnapshotTable.snapshotFiles(spark, t).size
    assert(before > 4, s"need fragmentation, got $before files")
    SnapshotTable.compactSnapshot(spark, t, targetBytes = 1L << 20)
    val after = SnapshotTable.snapshotFiles(spark, t).size
    assert(after < before, s"$before -> $after files")
    assert(SnapshotTable.read(spark, t).as[(Long, String)].collect().sorted.toSeq
      == rows.sorted, "content survives compaction")
    // the pre-compaction snapshot remains readable until vacuum — the
    // property Layout.compactInPlace cannot give
    assert(SnapshotTable.read(spark, t, version = 1L).count() == 40)
    SnapshotTable.vacuum(spark, t, retain = 1)
    assert(SnapshotTable.read(spark, t).count() == 40)
  }
}
