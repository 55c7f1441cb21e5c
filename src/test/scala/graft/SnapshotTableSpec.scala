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

  test("a crash BEFORE the manifest publish is inert: readers stay on the old snapshot") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t, Seq((1L, "live")).toDF("k", "tag"))
    // simulate a writer that claimed v2, staged its data and manifest
    // tmp, then died BEFORE the manifest rename (the commit point):
    // claim + data dir + tmp present, manifest-00002 absent
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(t, "_graft_meta", "claim-00002"))
    Seq((2L, "orphan")).toDF("k", "tag").write.parquet(s"$t/data-00002")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_graft_meta", "manifest-00002.tmp-2"),
      "data-00002/part-orphan.parquet".getBytes("UTF-8"))
    assert(SnapshotTable.currentVersion(spark, t) == 1L,
      "no manifest-00002 -> table still at v1")
    assert(SnapshotTable.read(spark, t).select("tag").head().getString(0) == "live")
    // the next real commit skips the claimed/orphaned version number
    val v = SnapshotTable.commit(spark, t, Seq((3L, "next")).toDF("k", "tag"))
    assert(v == 3L, s"dead claim occupies v2; the commit takes v3, got $v")
    assert(SnapshotTable.read(spark, t).select("tag").head().getString(0) == "next")
    // readers and vacuum tolerate the GAP at v2 (the pre-fix vacuum
    // walked a dense range and threw FileNotFound on the hole), and
    // vacuum sweeps the dead claim + manifest tmp + orphan data
    assert(SnapshotTable.vacuum(spark, t, retain = 2) >= 3L)
    val meta = new java.io.File(s"$t/_graft_meta").list().toSet
    assert(!meta.contains("claim-00002") &&
      !meta.contains("manifest-00002.tmp-2"), s"dead artifacts swept: $meta")
    assert(!new java.io.File(s"$t/data-00002").exists(), "orphan data swept")
    assert(SnapshotTable.read(spark, t).count() == 1, "current snapshot intact")
    assert(SnapshotTable.read(spark, t, version = 1L).count() == 1,
      "retain=2 kept v1 across the gap")
  }

  test("racing committers: exactly one writer per version, losers retry on the next") {
    import spark.implicits._
    val t = mkTable()
    val threads = 4
    val perThread = 3
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val fs = (0 until threads).map { w =>
      scala.concurrent.Future {
        (0 until perThread).map { i =>
          SnapshotTable.commit(spark, t,
            Seq((w.toLong, s"w$w-c$i")).toDF("k", "tag"))
        }
      }
    }
    val versions = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(fs),
      scala.concurrent.duration.Duration(120, "s")).flatten
    pool.shutdown()
    val n = threads * perThread
    assert(versions.toSet.size == n, s"every committer owns a distinct version: $versions")
    assert(versions.toSet == (1L to n.toLong).toSet,
      s"same-JVM claims serialize densely 1..$n: ${versions.sorted}")
    assert(SnapshotTable.currentVersion(spark, t) == n.toLong)
    // every version is a complete, readable snapshot of exactly one commit
    (1L to n.toLong).foreach { v =>
      assert(SnapshotTable.read(spark, t, v).count() == 1, s"v$v readable")
    }
  }

  test("concurrent merges lose no updates: conditional commit + retry") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 20L).map(i => (i, 0L)).toDF("k", "v"))
    // two mergers race repeatedly over DISJOINT key ranges; with a
    // last-writer-wins commit one side's increments would vanish
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    def bump(lo: Long, hi: Long, rounds: Int) = scala.concurrent.Future {
      (0 until rounds).foreach { _ =>
        val ch = (lo until hi).map(k => (k, 1L)).toDF("k", "d")
          .withColumnRenamed("d", "v") // change rows carry target schema
        SnapshotTable.merge(spark, t, ch
          .join(SnapshotTable.read(spark, t).withColumnRenamed("v", "cur"), Seq("k"))
          .select(col("k"), (col("v") + col("cur")).as("v")),
          Seq("k"))
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(Seq(bump(0L, 10L, 3), bump(10L, 20L, 3))),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    val got = SnapshotTable.read(spark, t).as[(Long, Long)].collect().toMap
    assert(got.size == 20 && got.values.forall(_ == 3L),
      s"both mergers' 3 increments survive on every key: $got")
  }

  test("concurrent scoped mergers on different days both land; no update lost") {
    import spark.implicits._
    val t = mkTable()
    val rows = for (d <- 0L until 4L; k <- 0L until 25L)
      yield (d * 100L + k, d, "old")
    SnapshotTable.commit(spark, t,
      rows.toDF("k", "day", "v").repartitionByRange(4, col("day"))
        .sortWithinPartitions("day"),
      statsCols = Seq("day"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    def scopedBump(day: Long) = scala.concurrent.Future {
      val ch = (0L until 25L).map(k => (day * 100L + k, day, s"NEW$day"))
        .toDF("k", "day", "v")
      SnapshotTable.mergeScoped(spark, t, ch, Seq("k"), scopeCol = "day")
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(Seq(scopedBump(1L), scopedBump(3L))),
      scala.concurrent.duration.Duration(300, "s"))
    pool.shutdown()
    val got = SnapshotTable.read(spark, t)
      .as[(Long, Long, String)].collect()
    assert(got.length == rows.size)
    got.foreach { case (_, d, v) =>
      if (d == 1L || d == 3L) assert(v == s"NEW$d", s"day $d updated")
      else assert(v == "old", s"day $d untouched")
    }
  }

  test("releaseStaleClaims unblocks conditional commits a dead claim starves") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t, Seq((1L, "live")).toDF("k", "v"))
    // an APPENDER claimed v2, staged its data and leaf, and died
    // before the manifest rename — the full crashed-append residue
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(t, "_graft_meta", "claim-00002"))
    Seq((9L, "orphan")).toDF("k", "v").write.parquet(s"$t/data-00002")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_graft_meta", "leaf-00002"),
      "data-00002/part-orphan.parquet".getBytes("UTF-8"))
    assert(SnapshotTable.currentVersion(spark, t) == 1L,
      "a leaf without its manifest is inert")
    val changes = Seq((1L, "merged")).toDF("k", "v")
    // every conditional attempt claims ≥3, never the successor of 1
    intercept[graft.sources.ConcurrentCommitException] {
      SnapshotTable.merge(spark, t, changes, Seq("k"))
    }
    // vacuum must NOT touch ANY of it (above current — could be a live
    // writer mid-commit): not the claim, and not the staged data dir
    // either — deleting data-00002 here would let a live writer publish
    // a manifest referencing vanished files
    SnapshotTable.vacuum(spark, t, retain = 1)
    assert(new java.io.File(s"$t/_graft_meta/claim-00002").exists())
    assert(new java.io.File(s"$t/data-00002").exists(),
      "a staged data dir above current survives vacuum (live-writer guard)")
    // the maintenance call with an age threshold releases it — claim,
    // orphan data dir AND orphan leaf all go
    assert(SnapshotTable.releaseStaleClaims(spark, t, olderThanMs = 0L) == 1L)
    assert(!new java.io.File(s"$t/data-00002").exists() &&
      !new java.io.File(s"$t/_graft_meta/leaf-00002").exists(),
      "crashed append's stage fully reclaimed")
    val v = SnapshotTable.merge(spark, t, changes, Seq("k"))
    assert(v == 2L, s"released claim frees its version, got v$v")
    assert(SnapshotTable.read(spark, t).select("v").head().getString(0) == "merged")
  }

  test("mergeScoped rewrites only touched files; untouched lines carry forward verbatim") {
    import spark.implicits._
    val t = mkTable()
    // 4 "days" × 50 keys, clustered by day so each file's envelope is narrow
    val rows = for (d <- 0L until 4L; k <- 0L until 50L)
      yield (d * 1000L + k, d, s"old-$d-$k")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "25")
    try SnapshotTable.commit(spark, t,
      rows.toDF("k", "day", "v").repartitionByRange(4, col("day"))
        .sortWithinPartitions("day"),
      statsCols = Seq("day"))
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val before = SnapshotTable.snapshotEntries(spark, t)
    val untouchedBefore = before.filter(e =>
      e.stats.get("day").exists { case (lo, hi) => hi < 2L || lo > 2L })
    assert(untouchedBefore.nonEmpty, "need files provably outside day=2")

    // changes touch ONLY day 2: update one key, delete one, insert one
    val changes = Seq(
      (2007L, 2L, "UPDATED", false),
      (2009L, 2L, "", true),
      (2999L, 2L, "INSERTED", false)).toDF("k", "day", "v", "del")
    val v2 = SnapshotTable.mergeScoped(spark, t, changes, Seq("k"),
      scopeCol = "day", deleteCol = Some("del"))
    assert(v2 == 2L)

    // content equals the full-merge expectation
    val got = SnapshotTable.read(spark, t).as[(Long, Long, String)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(got(2007L) == "UPDATED" && got(2999L) == "INSERTED" &&
      !got.contains(2009L) && got(1007L) == "old-1-7" &&
      got.size == rows.size, "scoped merge = MERGE semantics")

    // every provably-untouched line carried forward VERBATIM — same
    // path into the OLD data dir, same stats
    val after = SnapshotTable.snapshotEntries(spark, t, v2)
    val afterLines = after.map(_.render).toSet
    untouchedBefore.foreach { e =>
      assert(afterLines.contains(e.render),
        s"untouched file must survive by reference: ${e.render}")
    }
    // and the new files carry day envelopes (the NEXT scoped merge can
    // skip them too)
    val newFiles = after.filterNot(e => before.map(_.render).toSet.contains(e.render))
    assert(newFiles.nonEmpty && newFiles.forall(_.stats.contains("day")))
    // old snapshot still time-travels; vacuum(retain=1) keeps data-00001
    // because v2 still references files inside it
    assert(SnapshotTable.read(spark, t, version = 1L).count() == rows.size)
    SnapshotTable.vacuum(spark, t, retain = 1)
    assert(new java.io.File(s"$t/data-00001").exists(),
      "shared data dir survives vacuum while referenced")
    assert(SnapshotTable.read(spark, t).count() == rows.size,
      "snapshot intact after vacuum")
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
    // ≥ rather than ==: repartitionByRange samples with a
    // nondeterministic seed, so one straggler file can miss the y
    // window by luck — the property is "prunes ~nothing", not "exactly
    // nothing"
    assert(lYKept >= lTotal - 1, s"linear sort cannot prune y: $lYKept/$lTotal")
    assert(zYKept < zTotal, s"z-order must prune y too: $zYKept/$zTotal")
    assert(zKept < zTotal / 2, s"box query must skip most z files: $zKept/$zTotal")
    // and the pruned box read is exact
    val got = SnapshotTable.readPruned(spark, zt, box)
      .as[(Long, Long)].collect().sorted.toSeq
    val exp = rows.filter(r => r._1 >= 1000 && r._1 <= 1400 &&
      r._2 >= 1000 && r._2 <= 1400).sorted
    assert(got == exp, "multi-dim file skipping must not change results")
  }

  test("append commits new files without reading or rewriting anything; readAdded is exact CDC") {
    import spark.implicits._
    val t = mkTable()
    val v1 = SnapshotTable.append(spark, t,
      (0L until 10L).map(i => (i, "b1")).toDF("k", "tag"))
    assert(v1 == 1L, "append seeds an empty table")
    val v1Files = SnapshotTable.snapshotFiles(spark, t).toSet
    val v2 = SnapshotTable.append(spark, t,
      (10L until 15L).map(i => (i, "b2")).toDF("k", "tag"))
    // the previous snapshot's files carry by reference — append wrote
    // ONLY the new batch
    val v2Files = SnapshotTable.snapshotFiles(spark, t, v2).toSet
    assert(v1Files.subsetOf(v2Files), "append never rewrites existing files")
    assert(SnapshotTable.read(spark, t).count() == 15)
    // incremental consumption between appends = exactly the new rows
    assert(SnapshotTable.readAdded(spark, t, v1, v2)
      .as[(Long, String)].collect().toSet
      == (10L until 15L).map(i => (i, "b2")).toSet)
    // concurrent appenders: both land, nothing lost (append commutes)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    scala.concurrent.Await.result(scala.concurrent.Future.sequence(Seq(
      scala.concurrent.Future(SnapshotTable.append(spark, t,
        Seq((100L, "cA")).toDF("k", "tag"))),
      scala.concurrent.Future(SnapshotTable.append(spark, t,
        Seq((101L, "cB")).toDF("k", "tag"))))),
      scala.concurrent.duration.Duration(120, "s"))
    pool.shutdown()
    assert(SnapshotTable.read(spark, t).count() == 17,
      "both concurrent appends survive")
  }

  private def manifestLinesOf(t: String, v: Long): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(t, "_graft_meta", f"manifest-$v%05d"))
      .asScala.toSeq.filter(_.nonEmpty)
  }

  test("appends land as leaf manifests: top manifest grows with appends, not files") {
    import spark.implicits._
    val t = mkTable()
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "3")
    try {
      // 4 appends × 12 rows at ≤3 rows/file → ≥4 files per append
      var v = 0L
      (0 until 4).foreach { b =>
        v = SnapshotTable.append(spark, t,
          (0L until 12L).map(i => (b * 100L + i, b.toLong, s"r$i"))
            .toDF("k", "day", "v").repartition(1),
          statsCols = Seq("day"))
      }
      val top = manifestLinesOf(t, v)
      assert(top.count(_.startsWith("@include")) == 4 &&
        top.count(!_.startsWith("#")) == 4,
        s"4 appends = 4 include lines, regardless of file count: $top")
      val files = SnapshotTable.snapshotFiles(spark, t)
      assert(files.size >= 16, s"…while the table holds ${files.size} files")
      assert(SnapshotTable.read(spark, t).count() == 48)
      // leaf aggregate envelopes prune WHOLE batches at the top level
      val pruned = SnapshotTable.readPruned(spark, t, "day", 2L, 2L)
      assert(pruned.count() == 12, "leaf-level pruning keeps results exact")
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
  }

  test("scoped merge carries untouched LEAVES as unopened include lines") {
    import spark.implicits._
    val t = mkTable()
    (0 until 4).foreach { b =>
      SnapshotTable.append(spark, t,
        (0L until 10L).map(i => (b * 100L + i, b.toLong, "old"))
          .toDF("k", "day", "v"),
        statsCols = Seq("day"))
    }
    val beforeIncludes = manifestLinesOf(t, 4L).filter(_.startsWith("@include"))
    val v5 = SnapshotTable.mergeScoped(spark, t,
      Seq((105L, 1L, "UPD")).toDF("k", "day", "v"), Seq("k"), "day")
    val top = manifestLinesOf(t, v5)
    // days 0/2/3's leaves survive as their EXACT include lines; day 1's
    // leaf expanded (and its entries were all touched → rewritten)
    val carried = top.filter(_.startsWith("@include"))
    assert(carried.size == 3 && carried.forall(beforeIncludes.contains),
      s"3 cold leaves carried verbatim: $carried")
    val got = SnapshotTable.read(spark, t).as[(Long, Long, String)].collect()
    assert(got.length == 40 && got.count(_._3 == "UPD") == 1,
      "merge semantics intact across leaf boundaries")
    // vacuum: superseded versions' leaves die, referenced ones survive
    SnapshotTable.vacuum(spark, t, retain = 1)
    val leaves = new java.io.File(s"$t/_graft_meta").list().toSeq
      .filter(_.startsWith("leaf-"))
    assert(leaves.toSet == carried.map(_.split("\t")(1)).toSet,
      s"exactly the referenced leaves survive vacuum: $leaves")
    assert(SnapshotTable.read(spark, t).count() == 40, "table intact after vacuum")
  }

  test("schema lives in the manifest: appends evolve it explicitly, never by footer lottery") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 5L).map(i => (i, s"v$i")).toDF("k", "v"))
    // an append with a NEW column widens the committed schema; files
    // from before the evolution serve NULL for it
    SnapshotTable.append(spark, t,
      Seq((100L, "new", 7L)).toDF("k", "v", "extra"))
    val df = SnapshotTable.read(spark, t)
    assert(df.columns.toSeq == Seq("k", "v", "extra"),
      "manifest schema, not whichever footer lists first")
    val rows = df.as[(Long, String, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(rows((100L, "new")) == Some(7L) && rows((0L, "v0")) == None,
      "pre-evolution rows serve NULL for the added column")
    // a column the batch LACKS survives (its files serve NULL)
    SnapshotTable.append(spark, t, Seq((200L, "noextra")).toDF("k", "v"))
    assert(SnapshotTable.read(spark, t).columns.toSeq == Seq("k", "v", "extra"))
    // same-name type conflict fails LOUDLY at commit time
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.append(spark, t, Seq((300L, 9L, 1L)).toDF("k", "v", "extra"))
    }
    assert(e.getMessage.contains("schema evolution conflict"), e.getMessage)
    // time travel reads each version under ITS schema
    assert(SnapshotTable.read(spark, t, version = 1L).columns.toSeq == Seq("k", "v"))
  }

  test("readAdded returns exactly the manifest diff: inserts, rewritten scopes, nothing else") {
    import spark.implicits._
    val t = mkTable()
    val rows = for (d <- 0L until 3L; k <- 0L until 20L)
      yield (d * 100L + k, d, "old")
    SnapshotTable.commit(spark, t,
      rows.toDF("k", "day", "v").repartitionByRange(3, col("day"))
        .sortWithinPartitions("day"),
      statsCols = Seq("day"))
    // v2: an INSERT-only merge into a brand-new day — the diff is
    // exactly the inserted rows (no existing file intersects day 9)
    val inserts = (0L until 5L).map(k => (900L + k, 9L, "new")).toDF("k", "day", "v")
    val v2 = SnapshotTable.mergeScoped(spark, t, inserts, Seq("k"), "day")
    val addedV2 = SnapshotTable.readAdded(spark, t, fromVersion = 1L, toVersion = v2)
      .as[(Long, Long, String)].collect().toSet
    assert(addedV2 == inserts.as[(Long, Long, String)].collect().toSet,
      s"insert-only diff is the inserted rows: $addedV2")
    // v3: an UPDATE inside day 1 — the diff is day 1's post-merge
    // slice (the rewritten files), never days 0/2/9
    val upd = Seq((107L, 1L, "UPD")).toDF("k", "day", "v")
    val v3 = SnapshotTable.mergeScoped(spark, t, upd, Seq("k"), "day")
    val addedV3 = SnapshotTable.readAdded(spark, t, fromVersion = v2)
      .as[(Long, Long, String)].collect()
    assert(addedV3.forall(_._2 == 1L), s"diff stays inside the touched scope: ${addedV3.toSeq}")
    assert(addedV3.count(_._3 == "UPD") == 1 && addedV3.length == 20,
      "diff = the whole rewritten scope slice, post-merge")
    // from == to → empty with the right schema
    val none = SnapshotTable.readAdded(spark, t, fromVersion = v3, toVersion = v3)
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "day", "v"))
  }

  test("compactScoped rewrites only fragmented scopes; cold scopes carry by reference") {
    import spark.implicits._
    val t = mkTable()
    val rows = for (d <- 0L until 4L; k <- 0L until 20L)
      yield (d * 100L + k, d, "seed")
    SnapshotTable.commit(spark, t,
      rows.toDF("k", "day", "v").repartitionByRange(4, col("day"))
        .sortWithinPartitions("day"),
      statsCols = Seq("day"))
    // fragment day 2 the way real tables fragment: fast APPENDS of
    // small hot-scope batches (mergeScoped cannot fragment — it
    // rewrites whole scopes; append rewrites nothing)
    (1 to 5).foreach { i =>
      SnapshotTable.append(spark, t,
        Seq((200L + 50L + i, 2L, s"upd$i")).toDF("k", "day", "v"),
        statsCols = Seq("day"))
    }
    val before = SnapshotTable.snapshotEntries(spark, t)
    def filesFor(es: Seq[SnapshotTable.ManifestEntry], day: Long) =
      es.filter(_.stats.get("day").exists { case (lo, hi) => lo <= day && hi >= day })
    assert(filesFor(before, 2L).size > 2, "day 2 must be fragmented")
    val cold = before.filter(_.stats.get("day").exists {
      case (lo, hi) => hi < 2L || lo > 2L })
    assert(cold.nonEmpty, "need provably-cold files")

    val v = SnapshotTable.compactScoped(spark, t, "day", maxFilesPerScope = 2)
    assert(v > 0L, "fragmentation must trigger a compaction commit")
    val after = SnapshotTable.snapshotEntries(spark, t)
    assert(filesFor(after, 2L).size <= 2,
      s"hot scope compacted: ${filesFor(after, 2L).size} files")
    val afterLines = after.map(_.render).toSet
    cold.foreach(e => assert(afterLines.contains(e.render),
      s"cold file rewritten by compaction: ${e.render}"))
    // content is untouched by layout maintenance
    val got = SnapshotTable.read(spark, t).as[(Long, Long, String)]
      .collect().toSet
    assert(got.size == rows.size + 5 && (1 to 5).forall(i =>
      got.contains((250L + i, 2L, s"upd$i"))), "compaction preserves content")
    // an already-tidy table mints NO version
    val curBefore = SnapshotTable.currentVersion(spark, t)
    assert(SnapshotTable.compactScoped(spark, t, "day", maxFilesPerScope = 2) == 0L)
    assert(SnapshotTable.currentVersion(spark, t) == curBefore,
      "no empty maintenance versions")
  }

  test("a live writer mid-commit survives a concurrent vacuum and completes") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t, Seq((1L, "live")).toDF("k", "v"))
    // a writer claimed v2 and staged its data; its manifest hasn't
    // landed yet — exactly the state a concurrent vacuum sees mid-commit
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(t, "_graft_meta", "claim-00002"))
    Seq((2L, "staged")).toDF("k", "v").write.parquet(s"$t/data-00002")
    SnapshotTable.vacuum(spark, t, retain = 1)
    // the writer now completes: its staged file must still exist, and
    // the published snapshot must be fully readable
    val staged = new java.io.File(s"$t/data-00002").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).sorted
    assert(staged.nonEmpty, "vacuum must not delete a mid-commit stage")
    val lines = ("#schema\t" + Seq((2L, "staged")).toDF("k", "v").schema.json) +:
      staged.map(n => s"data-00002/$n").toSeq
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_graft_meta", "manifest-00002"),
      lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(t, "_graft_meta", "claim-00002"))
    assert(SnapshotTable.read(spark, t).select("v").head().getString(0)
      == "staged", "the writer's commit lands intact after the vacuum")
  }

  test("a failed commit releases its claim: caller errors never starve conditional commits") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t, Seq((1L, "live")).toDF("k", "v"))
    val empty = Seq.empty[(Long, String)].toDF("k", "v")
    // an EMPTY batch is a routine caller error — it must fail loudly...
    intercept[IllegalArgumentException] { SnapshotTable.append(spark, t, empty) }
    intercept[IllegalArgumentException] { SnapshotTable.commit(spark, t, empty) }
    // ...and leave NO residue: no claim above current (which would make
    // every later conditional commit lose 8 retries until a manual
    // releaseStaleClaims), no orphan stage
    val meta = new java.io.File(s"$t/_graft_meta").list().toSeq
    assert(!meta.exists(_.startsWith("claim-")), s"claims released: $meta")
    assert(!new java.io.File(s"$t/data-00002").exists(), "stage reclaimed")
    // the next conditional commit succeeds IMMEDIATELY as v2
    val v = SnapshotTable.merge(spark, t,
      Seq((1L, "merged")).toDF("k", "v"), Seq("k"))
    assert(v == 2L, s"conditional commit unstarved, got v$v")
  }

  test("append with a sink ledger is exactly-once: a replayed batch lands zero duplicate rows") {
    import spark.implicits._
    val t = mkTable()
    val sink = "/tmp/ckpt/ingest-1"
    val b0 = (0L until 10L).map(i => (i, "b0")).toDF("k", "tag")
    val v1 = SnapshotTable.append(spark, t, b0, ledger = Some((sink, 0L)))
    assert(v1 == 1L && SnapshotTable.lastCommittedBatch(spark, t, sink) == Some(0L))
    // the replay: same sinkId + batchId — a no-op returning the current
    // version, minting NO new version and NO duplicate rows
    val vReplay = SnapshotTable.append(spark, t, b0, ledger = Some((sink, 0L)))
    assert(vReplay == 1L && SnapshotTable.currentVersion(spark, t) == 1L)
    assert(SnapshotTable.read(spark, t).count() == 10, "zero duplicates")
    // the next batch commits normally; the diff across the replay holds
    // the batch exactly once
    val v2 = SnapshotTable.append(spark, t,
      (10L until 15L).map(i => (i, "b1")).toDF("k", "tag"),
      ledger = Some((sink, 1L)))
    assert(v2 == 2L)
    assert(SnapshotTable.readAdded(spark, t, v1, v2).count() == 5)
    // the ledger survives maintenance (compaction carries the header) —
    // a replay arriving AFTER a compaction must still skip
    SnapshotTable.compactSnapshot(spark, t)
    assert(SnapshotTable.lastCommittedBatch(spark, t, sink) == Some(1L),
      "ledger survives a whole-snapshot rewrite")
    SnapshotTable.append(spark, t,
      (10L until 15L).map(i => (i, "b1")).toDF("k", "tag"),
      ledger = Some((sink, 1L)))
    assert(SnapshotTable.read(spark, t).count() == 15,
      "post-compaction replay still skipped")
    // a SECOND sink's ledger is independent
    val v4 = SnapshotTable.append(spark, t,
      Seq((100L, "other")).toDF("k", "tag"), ledger = Some(("/tmp/ckpt/2", 0L)))
    assert(v4 > 0L && SnapshotTable.read(spark, t).count() == 16)
    assert(SnapshotTable.lastCommittedBatch(spark, t, sink) == Some(1L) &&
      SnapshotTable.lastCommittedBatch(spark, t, "/tmp/ckpt/2") == Some(0L))
  }

  test("deleteWhere is merge-on-read: no data file rewritten, reads subtract the keys, re-inserts survive") {
    import spark.implicits._
    val t = mkTable()
    val rows = for (d <- 0L until 4L; k <- 0L until 10L)
      yield (d * 100L + k, d, s"r-$d-$k")
    SnapshotTable.commit(spark, t,
      rows.toDF("k", "day", "v").repartitionByRange(4, col("day"))
        .sortWithinPartitions("day"),
      statsCols = Seq("day"))
    val dataBefore = SnapshotTable.snapshotFiles(spark, t).toSet
    // scattered victims across two scopes — the copy-on-write path
    // would rewrite both scopes' files; this writes ONE tiny key file
    val v2 = SnapshotTable.deleteWhere(spark, t,
      Seq(3L, 305L, 307L).toDF("k"))
    assert(v2 == 2L)
    assert(SnapshotTable.snapshotFiles(spark, t).toSet == dataBefore,
      "equality delete rewrites NOTHING: same data files by reference")
    assert(SnapshotTable.deleteFiles(spark, t)
      .map(_._2).toSet == Set(Seq("k")), "the delete entry is in the manifest")
    val got = SnapshotTable.read(spark, t).as[(Long, Long, String)]
      .collect().map(_._1).toSet
    assert(got.size == rows.size - 3 && !got.contains(3L) &&
      !got.contains(305L) && !got.contains(307L), "reads subtract the keys")
    // time travel: the pre-delete snapshot still serves the rows
    assert(SnapshotTable.read(spark, t, version = 1L).count() == rows.size)
    // pruned reads are delete-aware too
    assert(SnapshotTable.readPruned(spark, t, "day", 3L, 3L)
      .as[(Long, Long, String)].collect().map(_._1).toSet
      == (0L until 10L).map(300L + _).toSet -- Set(305L, 307L))
    // PLAN AUDIT: merge-on-read resolves as a BROADCAST hash anti-join
    // (the delete side is key rows), never a sort-merge join — at
    // 100 TB the corpus side must not shuffle to subtract kilobytes
    val plan = SnapshotTable.read(spark, t).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"delete application must broadcast: $plan")
    assert(!plan.contains("SortMergeJoin"), "no shuffle for the anti-join")
    // a RE-INSERT of a deleted key lands at a higher sequence number —
    // out of the delete's reach, so it serves (Iceberg semantics)
    SnapshotTable.append(spark, t, Seq((3L, 0L, "REBORN")).toDF("k", "day", "v"),
      statsCols = Seq("day"))
    val reborn = SnapshotTable.read(spark, t)
      .filter(col("k") === 3L).select("v").as[String].collect().toSeq
    assert(reborn == Seq("REBORN"), s"re-insert survives the older delete: $reborn")
    // ...and a NEWER delete reaches it
    SnapshotTable.deleteWhere(spark, t, Seq(3L).toDF("k"))
    assert(SnapshotTable.read(spark, t).filter(col("k") === 3L).count() == 0)
  }

  test("rewrites never resurrect equality-deleted rows; compaction purges them physically") {
    import spark.implicits._
    val t = mkTable()
    val rows = for (d <- 0L until 3L; k <- 0L until 10L)
      yield (d * 100L + k, d, "seed")
    SnapshotTable.commit(spark, t,
      rows.toDF("k", "day", "v").repartitionByRange(3, col("day"))
        .sortWithinPartitions("day"),
      statsCols = Seq("day"))
    SnapshotTable.deleteWhere(spark, t, Seq(105L).toDF("k"))
    // a scoped merge REWRITES day 1 (the deleted key's scope): its new
    // files carry a sequence number above the delete — if the rewrite
    // read were not delete-aware, 105 would ride it back to life
    SnapshotTable.mergeScoped(spark, t,
      Seq((107L, 1L, "UPD")).toDF("k", "day", "v"), Seq("k"), "day")
    val after = SnapshotTable.read(spark, t).as[(Long, Long, String)].collect()
    assert(!after.exists(_._1 == 105L), "no resurrection through the rewrite")
    assert(after.count(_._3 == "UPD") == 1 && after.length == rows.size - 1)
    // the delete line is still live (days 0/2 pre-date it)...
    assert(SnapshotTable.deleteFiles(spark, t).nonEmpty)
    // ...until a WHOLE rewrite: merge-commit purges physically
    SnapshotTable.merge(spark, t,
      Seq((205L, 2L, "UPD2")).toDF("k", "day", "v"), Seq("k"))
    assert(SnapshotTable.deleteFiles(spark, t).isEmpty,
      "whole-snapshot rewrite drops the delete entries")
    // physically gone: a RAW scan of the snapshot's files (bypassing
    // merge-on-read) no longer holds the key
    val raw = spark.read.parquet(
      SnapshotTable.snapshotFiles(spark, t).map(f => s"$t/$f"): _*)
    assert(raw.filter(col("k") === 105L).count() == 0, "purged from disk")
  }

  test("compactScoped purges deletes from rewritten scopes and drops obsolete delete lines") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 10L).map(k => (k, 0L, "seed")).toDF("k", "day", "v"),
      statsCols = Seq("day"))
    SnapshotTable.deleteWhere(spark, t, Seq(5L).toDF("k"))
    // fragment day 0 so compaction targets it
    (1 to 4).foreach { i =>
      SnapshotTable.append(spark, t,
        Seq((100L + i, 0L, s"a$i")).toDF("k", "day", "v"), statsCols = Seq("day"))
    }
    val v = SnapshotTable.compactScoped(spark, t, "day", maxFilesPerScope = 2)
    assert(v > 0L, "fragmentation triggers the compaction")
    // day 0's only pre-delete file was rewritten → nothing remaining
    // pre-dates the delete → the line is dropped, the rows are purged
    assert(SnapshotTable.deleteFiles(spark, t).isEmpty,
      "obsolete delete line dropped by the compaction")
    val raw = spark.read.parquet(
      SnapshotTable.snapshotFiles(spark, t).map(f => s"$t/$f"): _*)
    assert(raw.filter(col("k") === 5L).count() == 0, "physically purged")
    assert(SnapshotTable.read(spark, t).count() == 13)
  }

  test("readAdded is delete-aware and vacuum keeps live delete key files") {
    import spark.implicits._
    val t = mkTable()
    val v1 = SnapshotTable.append(spark, t,
      (0L until 10L).map(i => (i, "b1")).toDF("k", "tag"))
    val v2 = SnapshotTable.append(spark, t,
      (10L until 20L).map(i => (i, "b2")).toDF("k", "tag"))
    val v3 = SnapshotTable.deleteWhere(spark, t, Seq(12L, 15L).toDF("k"))
    // the diff consumer must not see rows the delete already removed
    val added = SnapshotTable.readAdded(spark, t, v1, v3)
      .as[(Long, String)].collect().map(_._1).toSet
    assert(added == (10L until 20L).toSet -- Set(12L, 15L),
      s"delete-aware CDC diff: $added")
    // vacuum(retain=1): the delete's key file is REFERENCED by the
    // current manifest — its dir must survive even though it holds no
    // data entries
    SnapshotTable.vacuum(spark, t, retain = 1)
    assert(new java.io.File(s"$t/data-00003").exists(),
      "live delete key file survives vacuum")
    assert(SnapshotTable.read(spark, t).count() == 18,
      "reads stay whole (and delete-aware) after vacuum")
  }

  test("rewriteManifests folds top lines metadata-only: identical file set, empty CDC diff") {
    import spark.implicits._
    val t = mkTable()
    (0 until 10).foreach { b =>
      SnapshotTable.append(spark, t,
        (0L until 6L).map(i => (b * 100L + i, b.toLong, s"r$i"))
          .toDF("k", "day", "v"),
        statsCols = Seq("day"))
    }
    assert(manifestLinesOf(t, 10L).count(_.startsWith("@include")) == 10)
    val filesBefore = SnapshotTable.snapshotFiles(spark, t).toSet
    val v = SnapshotTable.rewriteManifests(spark, t, groupSize = 4)
    assert(v == 11L)
    val top = manifestLinesOf(t, v).filterNot(_.startsWith("#"))
    assert(top.size == 3 && top.forall(_.startsWith("@include")),
      s"10 lines at groupSize 4 fold to 3 merged leaves: $top")
    assert(SnapshotTable.snapshotFiles(spark, t).toSet == filesBefore,
      "pure metadata: the data file set is byte-identical")
    assert(SnapshotTable.readAdded(spark, t, 10L, v).count() == 0,
      "incremental consumers see an EMPTY diff across the fold")
    assert(SnapshotTable.read(spark, t).count() == 60)
    // leaf aggregate envelopes still prune: day 9 lives in ONE merged leaf
    assert(SnapshotTable.readPruned(spark, t, "day", 9L, 9L).count() == 6)
    // repeated folding converges and then no-ops
    assert(SnapshotTable.rewriteManifests(spark, t, groupSize = 4) == 12L)
    assert(SnapshotTable.rewriteManifests(spark, t, groupSize = 4) == 0L,
      "a single surviving line folds nothing: no version minted")
    // vacuum sweeps the superseded append leaves, keeps the merged ones
    SnapshotTable.vacuum(spark, t, retain = 1)
    val leaves = new java.io.File(s"$t/_graft_meta").list().toSeq
      .filter(_.startsWith("leaf-"))
    assert(leaves.forall(_.startsWith("leaf-00012")), s"only the live fold: $leaves")
    assert(SnapshotTable.read(spark, t).count() == 60, "intact after vacuum")
  }

  test("a delete survives manifest folding: the merged leaf's __minv guards the drop rule") {
    import spark.implicits._
    val t = mkTable()
    // v1: day 0 as ONE file (holds the victim; must stay COLD below),
    // v2: the equality delete, v3-v5: day-1 appends (fragmentation)
    SnapshotTable.append(spark, t,
      (0L until 10L).map(i => (i, 0L, "d0")).toDF("k", "day", "v")
        .coalesce(1),
      statsCols = Seq("day"))
    SnapshotTable.deleteWhere(spark, t, Seq(5L).toDF("k"))
    (1 to 3).foreach { i =>
      SnapshotTable.append(spark, t,
        Seq((100L + i, 1L, s"d1-$i")).toDF("k", "day", "v"),
        statsCols = Seq("day"))
    }
    // fold everything into ONE merged leaf whose NAME version (6) is
    // above the delete's (2) — only its __minv token (1) records that
    // pre-delete files are inside
    val v = SnapshotTable.rewriteManifests(spark, t, groupSize = 8)
    assert(v == 6L && SnapshotTable.deleteFiles(spark, t).nonEmpty)
    // compaction of the fragmented day 1 runs the delete-DROP rule;
    // without __minv it would read the merged leaf's name, conclude
    // nothing pre-dates the delete, drop it — and k=5 (alive in
    // data-00001, untouched by this rewrite) would resurrect
    val v2 = SnapshotTable.compactScoped(spark, t, "day", maxFilesPerScope = 2)
    assert(v2 > 0L, "day 1 is fragmented; compaction must fire")
    assert(SnapshotTable.deleteFiles(spark, t).nonEmpty,
      "the delete line survives: a folded file still pre-dates it")
    val got = SnapshotTable.read(spark, t).as[(Long, Long, String)]
      .collect().map(_._1).toSet
    assert(!got.contains(5L) && got.size == 12, s"no resurrection: $got")
    // a full compaction (everything rewritten) finally purges it
    SnapshotTable.compactSnapshot(spark, t)
    assert(SnapshotTable.deleteFiles(spark, t).isEmpty)
    assert(SnapshotTable.read(spark, t).count() == 12)
  }

  test("rowCount answers count(*) from the manifest; refuses when metadata cannot certify it") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 40L).map(i => (i, i % 4, s"r$i")).toDF("k", "day", "v")
        .repartition(4), statsCols = Seq("day"))
    assert(SnapshotTable.rowCount(spark, t) == Some(40L), "exact, no scan")
    SnapshotTable.append(spark, t,
      (100L until 107L).map(i => (i, 9L, "a")).toDF("k", "day", "v"))
    assert(SnapshotTable.rowCount(spark, t) == Some(47L),
      "appends extend the manifest count")
    assert(SnapshotTable.rowCount(spark, t, version = 1L) == Some(40L),
      "per-version counts")
    assert(SnapshotTable.read(spark, t).count() == 47L, "matches the scan")
    // a scoped merge with a DELETE rewrites touched files — counts stay
    // exact because the rewritten files carry fresh row counts
    SnapshotTable.mergeScoped(spark, t,
      Seq((101L, 9L, "", true)).toDF("k", "day", "v", "del"),
      Seq("k"), "day", deleteCol = Some("del"))
    assert(SnapshotTable.rowCount(spark, t) == Some(46L))
    // live EQUALITY deletes make file counts an overestimate: refuse
    SnapshotTable.deleteWhere(spark, t, Seq(5L, 6L).toDF("k"))
    assert(SnapshotTable.rowCount(spark, t).isEmpty,
      "merge-on-read counts are not certifiable from metadata")
    assert(SnapshotTable.read(spark, t).count() == 44L, "the fallback is the scan")
    // compaction purges the deletes physically: exact again
    SnapshotTable.compactSnapshot(spark, t)
    assert(SnapshotTable.rowCount(spark, t) == Some(44L))
    // a hand-written legacy manifest line without the token: refuse
    val mf = new java.io.File(s"$t/_graft_meta").list()
      .filter(_.startsWith("manifest-")).sorted.last
    val p = java.nio.file.Paths.get(t, "_graft_meta", mf)
    val lines = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .linesIterator.map(l =>
        if (l.startsWith("#") || !l.contains("__rows=")) l
        else l.split("\t").filterNot(_.startsWith("__rows=")).mkString("\t"))
      .mkString("\n")
    java.nio.file.Files.write(p, lines.getBytes("UTF-8"))
    // the raw edit bypassed Hadoop's checksum sidecar — drop it
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(t, "_graft_meta", s".$mf.crc"))
    assert(SnapshotTable.rowCount(spark, t).isEmpty,
      "pre-token entries make the count uncertifiable")
  }

  test("schema evolution WIDENS numeric columns losslessly; incompatible changes still fail loudly") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x")) // int32 / float files
    // a batch with WIDER types: the committed schema becomes
    // long/double and the OLD int32/float files read under it
    SnapshotTable.append(spark, t,
      Seq((100L, 9.25)).toDF("k", "x"))
    val df = SnapshotTable.read(spark, t)
    assert(df.schema.fields.map(_.dataType).toSeq
      == Seq(LongType, DoubleType), df.schema.simpleString)
    val got = df.as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 1.5), (2L, 2.5), (100L, 9.25)),
      s"pre-widening values read exactly under the wider schema: $got")
    // a NARROW batch after the widening: schema stays wide, the new
    // int32 file reads under long
    SnapshotTable.append(spark, t, Seq((7, 0.5f)).toDF("k", "x"))
    assert(SnapshotTable.read(spark, t).schema.fields.map(_.dataType).toSeq
      == Seq(LongType, DoubleType))
    assert(SnapshotTable.read(spark, t).count() == 4)
    // long -> double is LOSSY above 2^53 and must refuse
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.append(spark, t, Seq((1.0, 1.0)).toDF("k", "x"))
    }
    assert(e.getMessage.contains("schema evolution conflict"), e.getMessage)
    // time travel still reads v1 under ITS narrow schema
    assert(SnapshotTable.read(spark, t, version = 1L)
      .schema.fields.map(_.dataType).toSeq == Seq(IntegerType, FloatType))
  }

  test("deleteRange drops whole in-range files metadata-only; boundary files rewrite with the complement") {
    import spark.implicits._
    val t = mkTable()
    // 4 day-clustered files: day envelopes [0,0][1,1][2,2][3,3]
    val rows = for (d <- 0L until 4L; k <- 0L until 10L)
      yield (d * 100L + k, d, s"r-$d-$k")
    // BOTH columns enveloped: the k-range case below must be able to
    // PROVE day 0's file disjoint (a file without a k envelope is
    // conservatively a boundary file and would rewrite)
    SnapshotTable.commit(spark, t,
      rows.toDF("k", "day", "v").repartitionByRange(4, col("day"))
        .sortWithinPartitions("day"),
      statsCols = Seq("day", "k"))
    val dataDirsBefore = new java.io.File(t).list().count(_.startsWith("data-"))
    // retention: drop days 1..2 — every affected file is ENTIRELY in
    // range, so the commit is one manifest write and ZERO data jobs
    val v2 = SnapshotTable.deleteRange(spark, t, "day", 1L, 2L)
    assert(v2 == 2L)
    assert(new java.io.File(t).list().count(_.startsWith("data-"))
      == dataDirsBefore, "metadata-only: no new data dir written")
    val got = SnapshotTable.read(spark, t).as[(Long, Long, String)].collect()
    assert(got.length == 20 && got.forall(r => r._2 == 0L || r._2 == 3L))
    assert(SnapshotTable.read(spark, t, version = 1L).count() == 40,
      "time travel over the retained pre-delete snapshot")
    // BOUNDARY case: a range cutting INTO day 3 (values 305..399 of
    // k) — day 3's file straddles, day 0's is disjoint and must carry
    val before = SnapshotTable.snapshotEntries(spark, t, v2)
    val day0 = before.filter(_.stats.get("day").exists(_._2 == 0L))
    val v3 = SnapshotTable.deleteRange(spark, t, "k", 305L, 9999L,
      statsCols = Seq("day", "k")) // rewritten files keep BOTH envelopes
    val after = SnapshotTable.snapshotEntries(spark, t, v3)
    val afterLines = after.map(_.render).toSet
    day0.foreach(e => assert(afterLines.contains(e.render),
      s"disjoint file carried verbatim: ${e.render}"))
    val got3 = SnapshotTable.read(spark, t).as[(Long, Long, String)].collect()
    assert(got3.count(_._2 == 3L) == 5 && got3.length == 15,
      "boundary rewrite keeps only the complement")
    // a provably-missing range mints NO version
    assert(SnapshotTable.deleteRange(spark, t, "day", 50L, 60L) == 0L)
    assert(SnapshotTable.currentVersion(spark, t) == v3)
  }

  test("deleteRange drops whole append LEAVES and composes with equality deletes") {
    import spark.implicits._
    val t = mkTable()
    (0 until 4).foreach { b =>
      SnapshotTable.append(spark, t,
        (0L until 10L).map(i => (b * 100L + i, b.toLong, "old"))
          .toDF("k", "day", "v"),
        statsCols = Seq("day"))
    }
    // an equality delete on a key in day 3 — day 3's file will be a
    // BOUNDARY file below; the rewrite must not resurrect the key
    SnapshotTable.deleteWhere(spark, t, Seq(305L).toDF("k"))
    // drop days 0..1 whole (two append leaves die as single lines) and
    // cut into day 3 via k >= 303 (a boundary rewrite)
    val v = SnapshotTable.deleteRange(spark, t, "day", 0L, 1L)
    val top = manifestLinesOf(t, v).filter(_.startsWith("@include"))
    assert(top.size == 2, s"two whole leaves dropped metadata-only: $top")
    assert(SnapshotTable.read(spark, t).count() == 19) // 20 - eq-delete
    val v2 = SnapshotTable.deleteRange(spark, t, "k", 303L, 307L)
    val got = SnapshotTable.read(spark, t).as[(Long, Long, String)]
      .collect().map(_._1).toSet
    assert(!got.contains(305L) && !got.contains(303L) && got.contains(308L) &&
      got.contains(201L), s"boundary rewrite composes with the eq-delete: $got")
    assert(SnapshotTable.read(spark, t).count() == 15)
    // vacuum reclaims the dropped days' data
    SnapshotTable.vacuum(spark, t, retain = 1)
    assert(!new java.io.File(s"$t/data-00001").exists() &&
      !new java.io.File(s"$t/data-00002").exists(),
      "dropped files reclaimed by vacuum")
    assert(SnapshotTable.read(spark, t).count() == 15, "intact after vacuum")
  }

  test("history summarizes retained versions from manifests alone") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.append(spark, t,
      (0L until 10L).map(i => (i, "b0")).toDF("k", "v"),
      ledger = Some(("s1", 0L)))
    SnapshotTable.append(spark, t,
      (10L until 15L).map(i => (i, "b1")).toDF("k", "v"),
      ledger = Some(("s1", 1L)))
    SnapshotTable.deleteWhere(spark, t, Seq(3L).toDF("k"))
    val h = SnapshotTable.history(spark, t)
    assert(h.map(_.version) == Seq(3L, 2L, 1L), "newest first")
    val v3 = h.head
    assert(v3.deleteFiles == 1 && v3.rows.isEmpty,
      "live deletes: count uncertifiable from metadata")
    assert(v3.sinkLedger == Map("s1" -> 1L), "the sink's committed watermark")
    val v2 = h(1)
    assert(v2.rows == Some(15L) && v2.deleteFiles == 0 && v2.schemaColumns == 2)
    assert(h.last.rows == Some(10L))
    // vacuum shrinks the history to the retained window
    SnapshotTable.vacuum(spark, t, retain = 1)
    assert(SnapshotTable.history(spark, t).map(_.version) == Seq(3L))
  }

  test("racing deleteWhere and appends all land: conditional commits serialize the delete correctly") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 30L).map(i => (i, "seed")).toDF("k", "v"))
    // three appenders of DISJOINT new keys race one deleter of seed
    // keys; whatever the serialization, the outcome is deterministic:
    // seed minus victims plus every append (appended keys are not
    // victims, and a delete sequences AFTER any append it follows)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val work =
      (0 until 3).map { w =>
        scala.concurrent.Future(SnapshotTable.append(spark, t,
          (0L until 5L).map(i => (1000L + w * 10L + i, s"a$w")).toDF("k", "v")))
      } :+ scala.concurrent.Future(
        SnapshotTable.deleteWhere(spark, t, Seq(3L, 7L, 11L).toDF("k")))
    scala.concurrent.Await.result(scala.concurrent.Future.sequence(work),
      scala.concurrent.duration.Duration(180, "s"))
    pool.shutdown()
    val got = SnapshotTable.read(spark, t).as[(Long, String)].collect().map(_._1).toSet
    val want = (0L until 30L).toSet -- Set(3L, 7L, 11L) ++
      (for (w <- 0 until 3; i <- 0 until 5) yield 1000L + w * 10L + i).toSet
    assert(got == want, s"every racer landed exactly once: ${got.size} vs ${want.size}")
  }

  test("widerOf-backed evolution is commutative and idempotent across the numeric lattice") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // append order must not change the final schema: int then long
    // lands where long then int does
    val a = mkTable(); val b = mkTable()
    SnapshotTable.commit(spark, a, Seq((1, 1.5f)).toDF("k", "x"))
    SnapshotTable.append(spark, a, Seq((2L, 2.5)).toDF("k", "x"))
    SnapshotTable.commit(spark, b, Seq((2L, 2.5)).toDF("k", "x"))
    SnapshotTable.append(spark, b, Seq((1, 1.5f)).toDF("k", "x"))
    val (sa, sb) = (SnapshotTable.read(spark, a).schema,
      SnapshotTable.read(spark, b).schema)
    assert(sa.fields.map(_.dataType).toSeq == Seq(LongType, DoubleType) &&
      sb.fields.map(_.dataType).toSeq == Seq(LongType, DoubleType),
      s"commutative widening: ${sa.simpleString} / ${sb.simpleString}")
    // idempotent: re-appending the SAME narrow shape changes nothing
    SnapshotTable.append(spark, a, Seq((3, 3.5f)).toDF("k", "x"))
    assert(SnapshotTable.read(spark, a).schema.fields.map(_.dataType).toSeq
      == Seq(LongType, DoubleType))
    assert(SnapshotTable.read(spark, a).as[(Long, Double)].collect().toSet
      == Set((1L, 1.5), (2L, 2.5), (3L, 3.5)))
  }

  test("the commit protocol runs unchanged over a conditional-put primitive (object-store seam)") {
    import spark.implicits._
    // an in-memory CAS primitive: claims are conditional puts into a
    // map, never files — the S3 If-None-Match / GCS ifGenerationMatch=0
    // shape. The REST of the protocol (stage, manifest rename, retry
    // loops) must not notice.
    val cas = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
    val prior = SnapshotTable.claimPrimitive
    SnapshotTable.claimPrimitive = new graft.sources.CommitPrimitive {
      def tryClaim(f: org.apache.hadoop.fs.FileSystem,
                   path: org.apache.hadoop.fs.Path): Boolean =
        cas.putIfAbsent(path.toString, java.lang.Boolean.TRUE) == null
      def release(f: org.apache.hadoop.fs.FileSystem,
                  path: org.apache.hadoop.fs.Path): Unit = {
        cas.remove(path.toString); ()
      }
    }
    try {
      val t = mkTable()
      SnapshotTable.commit(spark, t,
        (0L until 10L).map(i => (i, 0L, "seed")).toDF("k", "day", "v"),
        statsCols = Seq("day"))
      SnapshotTable.merge(spark, t,
        Seq((3L, 0L, "UPD")).toDF("k", "day", "v"), Seq("k"))
      SnapshotTable.append(spark, t,
        Seq((100L, 1L, "app")).toDF("k", "day", "v"),
        statsCols = Seq("day"), ledger = Some(("s", 0L)))
      SnapshotTable.deleteWhere(spark, t, Seq(5L).toDF("k"))
      assert(SnapshotTable.read(spark, t).count() == 10)
      // racing committers still get distinct dense versions through CAS
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val vs = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence((0 until 3).map(w =>
          scala.concurrent.Future(SnapshotTable.append(spark, t,
            Seq((200L + w, 2L, s"c$w")).toDF("k", "day", "v"))))),
        scala.concurrent.duration.Duration(120, "s"))
      pool.shutdown()
      assert(vs.toSet.size == 3, s"distinct versions via conditional put: $vs")
      assert(SnapshotTable.read(spark, t).count() == 13)
      // and NO claim file ever touched the filesystem
      val claims = new java.io.File(s"$t/_graft_meta").list()
        .filter(_.startsWith("claim-"))
      assert(claims.isEmpty, s"claims lived in the CAS, not on disk: ${claims.toSeq}")
      assert(cas.isEmpty, "every claim was released")
    } finally SnapshotTable.claimPrimitive = prior
  }

  test("a lost conditional put: unconditional commits move up a version, conditional ones retry") {
    import spark.implicits._
    // contention fake: the FIRST take (of the whole test) fails as if a
    // rival's conditional put won the version; everything after is real
    def armed() = new java.util.concurrent.atomic.AtomicBoolean(true)
    var fireOnce = armed()
    val prior = SnapshotTable.claimPrimitive
    SnapshotTable.claimPrimitive = new graft.sources.CommitPrimitive {
      def tryClaim(f: org.apache.hadoop.fs.FileSystem,
                   path: org.apache.hadoop.fs.Path): Boolean =
        if (fireOnce.compareAndSet(true, false)) false
        else graft.sources.CreateExclusive.tryClaim(f, path)
      def release(f: org.apache.hadoop.fs.FileSystem,
                  path: org.apache.hadoop.fs.Path): Unit =
        graft.sources.CreateExclusive.release(f, path)
    }
    try {
      val t = mkTable()
      // unconditional commit: v1 "stolen" → the writer moves up to v2;
      // the version-number gap at 1 is tolerated everywhere
      val v = SnapshotTable.commit(spark, t, Seq((1L, "a")).toDF("k", "v"))
      assert(v == 2L, s"lost put skips to the next version, got v$v")
      assert(SnapshotTable.currentVersion(spark, t) == 2L)
      // conditional commit: the lost put aborts the attempt
      // (ConcurrentCommitException) and the retry loop re-reads and lands
      fireOnce = armed()
      val v2 = SnapshotTable.merge(spark, t,
        Seq((1L, "merged")).toDF("k", "v"), Seq("k"))
      assert(v2 == 3L, s"conditional commit retried past the lost put: v$v2")
      assert(SnapshotTable.read(spark, t)
        .select("v").head().getString(0) == "merged")
    } finally SnapshotTable.claimPrimitive = prior
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
