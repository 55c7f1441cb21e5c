package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The change-data-feed: a downstream materialization maintained from
  * `readChangeFeed` events — inserts from appends, key retractions
  * from deleteWhere, NOTHING from compaction — must equal the batch
  * recompute at every version.
  */
class GraftChangeFeedSpec extends SparkSpec {

  private def mkTable(): String =
    Files.createTempDirectory("snapcdf").toString + "/t"

  private case class Evt(k: Option[Long], tag: Option[String],
                         change: String, version: Long,
                         rangeCol: Option[String] = None,
                         rangeLo: Option[Long] = None,
                         rangeHi: Option[Long] = None)

  private def collectFeed(t: String, extra: (String, String)*): Seq[Evt] = {
    val got = new scala.collection.mutable.ArrayBuffer[Evt]()
    val r0 = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
    val r = extra.foldLeft(r0) { case (b, (k, v)) => b.option(k, v) }
    val q = r.load(t).writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("snapcdf-ckpt").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect().map { row =>
          Evt(if (row.isNullAt(0)) None else Some(row.getLong(0)),
            Option(row.getString(1)),
            row.getString(2), row.getLong(3),
            Option(row.getString(4)),
            if (row.isNullAt(5)) None else Some(row.getLong(5)),
            if (row.isNullAt(6)) None else Some(row.getLong(6)))
        }
        got.synchronized { got ++= rows }; ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    got.toSeq
  }

  /** Apply events in commit-version order: inserts add (row, stamp); a
    * key retraction at version v removes matching rows with stamp < v;
    * a range retraction at v removes rows with stamp < v whose range
    * column falls in [lo, hi] — each the table's own rule.
    */
  private def materialize(evts: Seq[Evt],
                          upTo: Long = Long.MaxValue): Set[(Long, String)] = {
    val live = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    evts.filter(_.version <= upTo).sortBy(_.version).foreach { e =>
      e.change match {
        case "insert" => live += ((e.k.get, e.tag.get, e.version))
        case "delete" =>
          live.filterInPlace { case (lk, _, lv) =>
            !(lk == e.k.get && lv < e.version) }
        case "delete_range" =>
          assert(e.rangeCol.contains("k"),
            s"this spec's tables range-delete on k only: $e")
          live.filterInPlace { case (lk, _, lv) =>
            !(lk >= e.rangeLo.get && lk <= e.rangeHi.get && lv < e.version) }
        case other => fail(s"unexpected event shape: $e")
      }
    }
    live.map { case (k, tag, _) => (k, tag) }.toSet
  }

  private def tableAt(t: String, v: Long): Set[(Long, String)] =
    SnapshotTable.read(spark, t, v).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("append + deleteWhere + compaction: the feed-maintained state equals the batch recompute at every version") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.append(spark, t,
      (0L until 10L).map(i => (i, "b1")).toDF("k", "tag"))          // v1
    SnapshotTable.append(spark, t,
      (10L until 15L).map(i => (i, "b2")).toDF("k", "tag"))         // v2
    SnapshotTable.deleteWhere(spark, t, Seq(3L, 12L).toDF("k"))     // v3
    SnapshotTable.compactSnapshot(spark, t)                         // v4
    SnapshotTable.append(spark, t,
      Seq((3L, "reborn"), (15L, "b5"), (16L, "b5")).toDF("k", "tag")) // v5
    val evts = collectFeed(t)
    // compaction emits NOTHING — rewritten rows are not changes
    assert(!evts.exists(_.version == 4L),
      s"v4 (compact) must emit zero events: ${evts.filter(_.version == 4L)}")
    assert(evts.count(_.change == "insert") == 18 && // 10 + 5 + 3
      evts.count(_.change == "delete") == 2,
      s"10+5+3 inserts, 2 retractions: $evts")
    // retraction rows populate the key, null elsewhere, stamped v3
    val dels = evts.filter(_.change == "delete")
    assert(dels.map(_.k).toSet == Set(Some(3L), Some(12L)) &&
      dels.forall(e => e.tag.isEmpty && e.version == 3L))
    // the materialization equals the table AT EVERY VERSION
    (1L to 5L).foreach { v =>
      assert(materialize(evts, v) == tableAt(t, v),
        s"feed-maintained state diverges from the table at v$v")
    }
    // the reborn k=3 (stamp 5) survives the v3 retraction
    assert(materialize(evts).contains((3L, "reborn")))
    // the feed's DATA columns read nullable regardless of the
    // committed flags: retraction rows null out non-key columns, and
    // advertising non-null would let the optimizer constant-fold
    // `tag IS NULL` on them to false
    val sch = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true").load(t).schema
    assert(sch.fields.dropRight(5).forall(_.nullable),
      s"feed data columns must be nullable: $sch")
    assert(!sch.fields.slice(sch.size - 5, sch.size - 3).exists(_.nullable),
      "the change stamps are genuinely non-null")
    assert(sch.fields.takeRight(3).forall(_.nullable),
      "the range columns populate only on delete_range rows")
  }

  test("a deleteRange mid-sequence emits ONE range event; the feed survives and matches the recompute at every version") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.append(spark, t,
      ((0L until 10L).map(i => (Some(i), "b1")) :+ ((None: Option[Long]), "bnull"))
        .toDF("k", "tag"), statsCols = Seq("k"))                    // v1
    SnapshotTable.append(spark, t,
      (10L until 15L).map(i => (i, "b2")).toDF("k", "tag"),
      statsCols = Seq("k"))                                         // v2
    assert(SnapshotTable.deleteRange(spark, t, "k", 3L, 11L) == 3L) // v3
    SnapshotTable.append(spark, t,
      Seq((3L, "reborn"), (20L, "b4")).toDF("k", "tag"),
      statsCols = Seq("k"))                                         // v4
    SnapshotTable.deleteWhere(spark, t, Seq(20L).toDF("k"))         // v5
    val evts = collectFeed(t)
    // v3 is exactly one delete_range row: data null, parameters carried
    val v3 = evts.filter(_.version == 3L)
    assert(v3.size == 1 && v3.head.change == "delete_range" &&
      v3.head.k.isEmpty && v3.head.tag.isEmpty &&
      v3.head.rangeCol.contains("k") && v3.head.rangeLo.contains(3L) &&
      v3.head.rangeHi.contains(11L),
      s"one range-retraction event with the commit's parameters: $v3")
    // the boundary rewrite's new files are NOT re-emitted as inserts
    assert(evts.count(_.change == "insert") == 18, // 11 + 5 + 2
      s"inserts are v1+v2+v4 only — no physical-rewrite re-delivery: " +
        s"${evts.count(_.change == "insert")}")
    // file rows carry null range columns
    assert(evts.filter(_.change != "delete_range")
      .forall(e => e.rangeCol.isEmpty && e.rangeLo.isEmpty))
    // materialization (with the null-k row, which SQL DELETE keeps)
    // equals the table at every version
    def mat(upTo: Long): Set[(Option[Long], String)] = {
      val live =
        scala.collection.mutable.ArrayBuffer[(Option[Long], String, Long)]()
      evts.filter(_.version <= upTo).sortBy(_.version).foreach { e =>
        e.change match {
          case "insert" => live += ((e.k, e.tag.get, e.version))
          case "delete" => live.filterInPlace { case (lk, _, lv) =>
            !(lk == e.k && lv < e.version) }
          case "delete_range" => live.filterInPlace { case (lk, _, lv) =>
            // null range values SURVIVE — SQL DELETE semantics
            !(lk.exists(v => v >= e.rangeLo.get && v <= e.rangeHi.get) &&
              lv < e.version) }
        }
      }
      live.map { case (k, tag, _) => (k, tag) }.toSet
    }
    (1L to 5L).foreach { v =>
      val table = SnapshotTable.read(spark, t, v).collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          r.getString(1))).toSet
      assert(mat(v) == table,
        s"feed-maintained state diverges from the table at v$v")
    }
    assert(mat(5L).contains((None, "bnull")) &&
      mat(5L).contains((Some(3L), "reborn")) &&
      !mat(5L).exists(e => e._1.exists(k => k >= 4L && k <= 11L)))
  }

  test("the CDF bootstrap pins the LOWEST retained version: vacuum cannot outrun the replay") {
    import spark.implicits._
    val t = mkTable()
    (1 to 3).foreach { i =>
      SnapshotTable.append(spark, t,
        Seq((i.toLong, s"b$i")).toDF("k", "tag"))
    }
    // drive the DSv2 handshake by hand so the PLANNING-time pin is
    // observable (a full query's commit callback would raise it)
    val provider = new graft.sources.GraftSnapshotSource
    val props = java.util.Map.of("path", t, "readChangeFeed", "true")
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(props)
    val schema = provider.inferSchema(opts)
    val table = provider.getTable(schema, Array.empty,
      new java.util.HashMap(props))
    val stream = table.asInstanceOf[
      org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(opts).build().toMicroBatchStream(
        Files.createTempDirectory("snapcdf-pin").toString)
    stream.planInputPartitions(stream.initialOffset(), stream.latestOffset())
    // the plain stream's bootstrap pins `to` (it reads only manifest
    // `to`'s files); the CDF replay walks EVERY retained manifest, so
    // its floor must be the lowest existing version
    assert(SnapshotTable.pinnedVersions(spark, t).values.min == 1L,
      s"CDF bootstrap floor: ${SnapshotTable.pinnedVersions(spark, t)}")
  }

  test("startingVersion bounds the feed; history surfaces the #op column") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.append(spark, t,
      (0L until 5L).map(i => (i, "b1")).toDF("k", "tag"))           // v1
    SnapshotTable.append(spark, t,
      Seq((5L, "b2")).toDF("k", "tag"))                             // v2
    SnapshotTable.deleteWhere(spark, t, Seq(0L).toDF("k"))          // v3
    SnapshotTable.rewriteManifests(spark, t, groupSize = 2)         // v4
    val evts = collectFeed(t, "startingVersion" -> "2")
    assert(evts.map(e => (e.change, e.version)).sorted ==
      Seq(("delete", 3L)),
      s"only post-v2 changes; manifest folding emits nothing: $evts")
    assert(SnapshotTable.history(spark, t).flatMap(_.op) ==
      Seq("rewriteManifests", "delete", "append", "append"),
      "history carries the op stamps, newest first")
  }

  test("maxVersionsPerTrigger paces the feed: bounded batches, identical events, no loss") {
    import spark.implicits._
    val t = mkTable()
    (1 to 4).foreach { b =>
      SnapshotTable.append(spark, t,
        (0L until 5L).map(i => (b * 100L + i, s"b$b")).toDF("k", "tag"))
    }
    SnapshotTable.deleteWhere(spark, t, Seq(101L, 302L).toDF("k")) // v5
    val batches = new scala.collection.mutable.ArrayBuffer[Seq[Evt]]()
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", 2).load(t)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("snapcdf-paced").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.collect().map { row =>
          Evt(if (row.isNullAt(0)) None else Some(row.getLong(0)),
            Option(row.getString(1)), row.getString(2), row.getLong(3))
        }.toSeq
        if (rows.nonEmpty) batches.synchronized { batches += rows }; ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batches.size == 3, // 5 versions at 2/trigger
      s"5 versions at 2/trigger = 3 non-empty batches: ${batches.size}")
    assert(batches.forall(_.map(_.version).distinct.size <= 2),
      "each batch spans at most 2 versions")
    val all = batches.flatten.toSeq
    assert(all.count(_.change == "insert") == 20 &&
      all.count(_.change == "delete") == 2,
      s"paced union = the whole feed, no loss: ${all.size}")
    // the paced feed materializes to the same table state
    assert(materialize(all) ==
      SnapshotTable.read(spark, t).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("in-place rewrites refuse loudly; batch reads of the feed refuse") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.append(spark, t,
      (0L until 5L).map(i => (i, s"r$i")).toDF("k", "tag"))         // v1
    SnapshotTable.merge(spark, t,
      Seq((1L, "updated")).toDF("k", "tag"), Seq("k"))              // v2: merge
    val e = intercept[Exception] { collectFeed(t) }
    def rootMsg(x: Throwable): String =
      if (x.getCause == null) x.getMessage else x.getMessage + rootMsg(x.getCause)
    assert(rootMsg(e).contains("change feed") && rootMsg(e).contains("merge"),
      s"a merge in range must refuse loudly: ${rootMsg(e)}")
    // the feed is a streaming-only surface
    val b = intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("readChangeFeed", "true").load(t).count()
    }
    assert(b.getMessage != null, b.toString)
  }
}
