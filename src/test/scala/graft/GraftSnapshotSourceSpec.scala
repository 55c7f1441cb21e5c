package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The DataSourceV2 door into the snapshot format: `spark.read
  * .format("graft-snapshot")` must resolve tables by the format's own
  * rules — manifest file list, manifest schema, versionAsOf time
  * travel — and be row-identical to `SnapshotTable.read` on every
  * delete-free snapshot.
  */
class GraftSnapshotSourceSpec extends SparkSpec {

  private def mkTable(): String =
    Files.createTempDirectory("snapdsv2").toString + "/t"

  private def viaFormat(t: String, version: Long = 0L) = {
    val r = spark.read.format("graft-snapshot")
    (if (version > 0L) r.option("versionAsOf", version) else r).load(t)
  }

  test("format reads = SnapshotTable.read: manifest file list, not directory listing") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    // an ORPHAN file in the data tree (a crashed writer's residue): the
    // directory has it, the manifest does not — format reads must not
    Seq((999L, "orphan")).toDF("k", "v").write.mode("append").parquet(s"$t/data-00001")
    assert(viaFormat(t).count() == 20,
      "manifest-resolved file set: the orphan is invisible")
    // row-identical parity with the Scala door (which excludes it too)
    assert(viaFormat(t).as[(Long, String)].collect().toSet
      == SnapshotTable.read(spark, t).as[(Long, String)].collect().toSet)
  }

  test("versionAsOf time travel and manifest-schema resolution (footer lottery closed)") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 5L).map(i => (i, s"v$i")).toDF("k", "v"))
    SnapshotTable.append(spark, t,
      Seq((100L, "new", 7L)).toDF("k", "v", "extra")) // schema evolution
    // current: the manifest's evolved schema, pre-evolution rows NULL
    val cur = viaFormat(t)
    assert(cur.columns.toSeq == Seq("k", "v", "extra"))
    assert(cur.filter(col("extra").isNull).count() == 5)
    assert(cur.as[(Long, String, Option[Long])].collect().toSet
      == SnapshotTable.read(spark, t).as[(Long, String, Option[Long])]
        .collect().toSet, "parity across schema evolution")
    // time travel reads v1 UNDER ITS OWN schema
    val v1 = viaFormat(t, version = 1L)
    assert(v1.columns.toSeq == Seq("k", "v") && v1.count() == 5)
    // predicate pushdown reaches the parquet scan (stock ParquetScan)
    val plan = cur.filter(col("k") === 100L).queryExecution.executedPlan.toString
    // NOTE: no IsNotNull(k) alongside — the manifest schema declares k
    // non-nullable, so the analyzer correctly drops the redundant check
    assert(plan.split("PushedFilters: \\[").last.takeWhile(_ != ']')
      .contains("EqualTo(k,100)"),
      s"pushdown must survive the connector: $plan")
  }

  test("the table is a streaming source: bootstrap + per-version increments, restart without duplicates") {
    import spark.implicits._
    val t = mkTable()
    val ckpt = Files.createTempDirectory("snapstream-ckpt").toString
    SnapshotTable.append(spark, t,
      (0L until 10L).map(i => (i, "b1")).toDF("k", "tag"))
    SnapshotTable.append(spark, t,
      (10L until 15L).map(i => (i, "b2")).toDF("k", "tag"))
    val got = new scala.collection.mutable.ArrayBuffer[(Long, String)]()
    def start() = spark.readStream.format("graft-snapshot").load(t)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.as[(Long, String)].collect() }; ()
      }
      .start()
    val q1 = start()
    q1.processAllAvailable()
    assert(got.size == 15 && got.map(_._1).toSet == (0L until 15L).toSet,
      s"bootstrap batch = the full current snapshot: ${got.size}")
    // an incremental append streams as EXACTLY the manifest diff
    SnapshotTable.append(spark, t,
      (15L until 18L).map(i => (i, "b3")).toDF("k", "tag"))
    q1.processAllAvailable()
    assert(got.size == 18, s"one increment, no re-delivery: ${got.size}")
    q1.stop()
    // appends while the stream is DOWN are picked up from the
    // checkpoint on restart — once, with no duplicates of the past
    SnapshotTable.append(spark, t,
      (18L until 20L).map(i => (i, "b4")).toDF("k", "tag"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.size == 20 && got.map(_._1).toSet == (0L until 20L).toSet,
      s"restart delivers exactly the missed versions: ${got.size}")
    // startingVersion=latest: a fresh stream sees only what comes next
    val late = new scala.collection.mutable.ArrayBuffer[Long]()
    val q3 = spark.readStream.format("graft-snapshot")
      .option("startingVersion", "latest").load(t)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("snapstream-ckpt2").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        late.synchronized { late ++= df.as[(Long, String)].collect().map(_._1) }; ()
      }
      .start()
    q3.processAllAvailable()
    assert(late.isEmpty, s"latest: nothing historical delivered: $late")
    SnapshotTable.append(spark, t, Seq((99L, "b5")).toDF("k", "tag"))
    q3.processAllAvailable()
    q3.stop()
    assert(late.toSeq == Seq(99L), s"latest: only the new append: $late")
  }

  test("maxVersionsPerTrigger paces the stream: bounded batches drain a backlog without loss") {
    import spark.implicits._
    val t = mkTable()
    // a 6-version backlog before the stream ever starts
    (1 to 6).foreach { b =>
      SnapshotTable.append(spark, t,
        (0L until 5L).map(i => (b * 100L + i, s"b$b")).toDF("k", "tag"))
    }
    val batches = new scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val q = spark.readStream.format("graft-snapshot")
      .option("maxVersionsPerTrigger", 2).load(t)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("snapstream-ckpt3").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = df.as[(Long, String)].collect().map(_._1).toSet
        if (ks.nonEmpty) batches.synchronized { batches += ks }; ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batches.size == 3,
      s"6 versions at 2/trigger = 3 batches, got ${batches.size}")
    assert(batches.forall(_.size == 10), "each batch spans exactly 2 versions")
    assert(batches.flatten.toSet.size == 30, "the union is the whole backlog, no loss")
  }

  test("pacing survives a CLEAN restart: no duplicate redelivery with maxVersionsPerTrigger") {
    import spark.implicits._
    val t = mkTable()
    val ckpt = Files.createTempDirectory("snapstream-ckpt-hwm").toString
    (1 to 4).foreach { b =>
      SnapshotTable.append(spark, t,
        Seq((b * 10L, s"b$b")).toDF("k", "tag"))
    }
    val got = new scala.collection.mutable.ArrayBuffer[Long]()
    def start() = spark.readStream.format("graft-snapshot")
      .option("maxVersionsPerTrigger", 1).load(t)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.as[(Long, String)].collect().map(_._1) }; ()
      }
      .start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // CLEAN stop: the last batch committed
    assert(got.sorted == Seq(10L, 20L, 30L, 40L), s"backlog drained paced: $got")
    // the served high-water mark must survive the restart: without
    // persistence, getOffset would re-cap at startAfter + 1 — BELOW
    // the checkpointed offset — and re-serve delivered version ranges
    SnapshotTable.append(spark, t, Seq((50L, "b5")).toDF("k", "tag"))
    SnapshotTable.append(spark, t, Seq((60L, "b6")).toDF("k", "tag"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.sorted == Seq(10L, 20L, 30L, 40L, 50L, 60L),
      s"exactly the two new versions, ZERO duplicates: ${got.sorted}")
  }

  test("a lagging consumer's committed offsets pin retention: aggressive vacuum cannot break replay") {
    import spark.implicits._
    val t = mkTable()
    val ckpt = Files.createTempDirectory("snapstream-ckpt-pin").toString
    (1 to 3).foreach { b =>
      SnapshotTable.append(spark, t, Seq((b.toLong, s"b$b")).toDF("k", "tag"))
    }
    val got = new scala.collection.mutable.ArrayBuffer[Long]()
    def start() = spark.readStream.format("graft-snapshot").load(t)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.as[(Long, String)].collect().map(_._1) }; ()
      }
      .start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // consumer committed through v3, then goes DOWN
    assert(SnapshotTable.pinnedVersions(spark, t).values.toSeq == Seq(3L),
      "the commit callback pinned the committed-through version")
    // while it lags, the table moves on and someone vacuums aggressively
    (4 to 6).foreach { b =>
      SnapshotTable.append(spark, t, Seq((b.toLong, s"b$b")).toDF("k", "tag"))
    }
    SnapshotTable.vacuum(spark, t, retain = 1)
    assert(SnapshotTable.history(spark, t).map(_.version).min == 3L,
      "the pin held v3+ against retain=1")
    // the lagging consumer restarts and replays exactly (3, 6]
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.sorted == (1L to 6L),
      s"replay across the vacuum delivered exactly the missed versions: ${got.sorted}")
  }

  test("a data-N-shaped directory ABOVE the table root cannot corrupt sequence numbers") {
    import spark.implicits._
    // the table lives UNDER a directory named like a data dir: every
    // file URI contains two data-N segments, and taking the FIRST
    // would give every file sequence number 1 — a v2 delete would then
    // wrongly apply to files written at v3+ (silent data loss through
    // the SQL door). The LAST segment must win, as in applyDeletes.
    val t = Files.createTempDirectory("morroot").toString + "/data-00001/t"
    SnapshotTable.commit(spark, t,
      (0L until 10L).map(i => (i, "v1")).toDF("k", "v"))
    SnapshotTable.deleteWhere(spark, t, Seq(3L).toDF("k"))      // v2
    SnapshotTable.append(spark, t, Seq((3L, "reborn")).toDF("k", "v")) // v3
    val got = viaFormat(t).as[(Long, String)].collect().toSet
    assert(got == SnapshotTable.read(spark, t).as[(Long, String)]
      .collect().toSet, "parity under a data-N-shaped root")
    assert(got.contains((3L, "reborn")) && !got.contains((3L, "v1")),
      s"the v3 re-insert must survive the v2 delete: $got")
  }

  test("restart without the pacing mark (V1-era checkpoint): the offset log still holds the floor") {
    import spark.implicits._
    val t = mkTable()
    val ckpt = Files.createTempDirectory("snapstream-nohwm").toString
    (1 to 3).foreach { b =>
      SnapshotTable.append(spark, t, Seq((b.toLong, s"b$b")).toDF("k", "tag"))
    }
    val got = new scala.collection.mutable.ArrayBuffer[Long]()
    def start() = spark.readStream.format("graft-snapshot")
      .option("maxVersionsPerTrigger", 1).load(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.as[(Long, String)].collect().map(_._1) }; ()
      }.start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(got.sorted == Seq(1L, 2L, 3L))
    // a checkpoint migrated from the V1 source has no graft-served-hwm
    // file — deserializeOffset must raise the pacing mark from the
    // offset log itself, else latestOffset re-caps BELOW the committed
    // offset and re-delivers
    java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt)).iterator()
      .forEachRemaining { p =>
        if (p.getFileName.toString == "graft-served-hwm")
          java.nio.file.Files.delete(p)
      }
    SnapshotTable.append(spark, t, Seq((4L, "b4")).toDF("k", "tag"))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    assert(got.sorted == Seq(1L, 2L, 3L, 4L),
      s"no duplicate redelivery without the mark file: ${got.sorted}")
  }

  test("timestampAsOf: wall-clock time travel through the SQL door") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t, Seq((1L, "v1")).toDF("k", "tag"))
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    SnapshotTable.commit(spark, t, Seq((2L, "v2")).toDF("k", "tag"))
    val old = spark.read.format("graft-snapshot")
      .option("timestampAsOf", between).load(t)
    assert(old.select("tag").head().getString(0) == "v1",
      "resolves the newest version committed at or before the timestamp")
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("timestampAsOf", between - 100000).load(t).count()
    }
    assert(e.getMessage.contains("at or before"), e.getMessage)
  }

  test("stream across schema evolution: batches decode under THEIR schema, serve the pinned shape") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      Seq((1, "a"), (2, "b")).toDF("k", "tag")) // k is INT at stream start
    val got = new scala.collection.mutable.ArrayBuffer[(Int, String)]()
    val q = spark.readStream.format("graft-snapshot").load(t)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("snapstream-evo").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        assert(df.schema.map(f => (f.name, f.dataType.typeName))
          == Seq(("k", "integer"), ("tag", "string")),
          "every batch serves the schema pinned at stream start")
        got.synchronized { got ++= df.as[(Int, String)].collect() }; ()
      }.start()
    q.processAllAvailable()
    // the table evolves UNDER the running stream: k widens to long and
    // a column appears — the new files decode under the evolved schema
    // and are cast/projected back to the pinned shape
    SnapshotTable.append(spark, t,
      Seq((3L, "c", 9.9)).toDF("k", "tag", "score"))
    q.processAllAvailable()
    q.stop()
    assert(got.sorted == Seq((1, "a"), (2, "b"), (3, "c")).sorted,
      s"widened batch served in the pinned shape: $got")
  }

  test("streaming a table while deletes land: diffs stay delete-aware, key files never stream") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.append(spark, t,
      (0L until 10L).map(i => (i, "b1")).toDF("k", "tag"))
    val got = new scala.collection.mutable.ArrayBuffer[Long]()
    val ckpt = Files.createTempDirectory("snapstream-del").toString
    def start() = spark.readStream.format("graft-snapshot").load(t)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.as[(Long, String)].collect().map(_._1) }; ()
      }.start()
    val q1 = start()
    q1.processAllAvailable()
    assert(got.sorted == (0L until 10L))
    // a deleteWhere commit adds a KEY file, not data: its diff batch is
    // empty (deletes are not retroactive CDC — same as readAdded)
    SnapshotTable.deleteWhere(spark, t, Seq(3L, 12L).toDF("k"))
    q1.processAllAvailable()
    assert(got.size == 10, "the delete version streams no rows")
    q1.stop()
    // while the stream is DOWN: new data lands, then one of the new
    // keys is deleted — the restart batch spans both versions, so the
    // diff must apply its END version's deletes to the new files:
    // k=13 arrives dead; k=12's delete PRE-DATES its file (sequence
    // rule: the v3 delete applies below v4) so it streams
    SnapshotTable.append(spark, t,
      Seq((12L, "b2"), (13L, "b2")).toDF("k", "tag"))
    SnapshotTable.deleteWhere(spark, t, Seq(13L).toDF("k"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.sorted == ((0L until 10L) :+ 12L),
      s"deterministic replay window: ${got.sorted}")
  }

  test("merge-on-read through SQL: live equality deletes resolve inside the scan, parity with the Scala door") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v"))       // v1
    SnapshotTable.deleteWhere(spark, t, Seq(3L, 7L).toDF("k"))   // v2: applies to v1 files
    SnapshotTable.append(spark, t,
      Seq((3L, "reborn"), (50L, "new")).toDF("k", "v"))          // v3: out of v2's reach
    SnapshotTable.deleteWhere(spark, t, Seq(50L, 11L).toDF("k")) // v4: applies to v1 AND v3
    def scalaRows(v: Long = 0L) =
      SnapshotTable.read(spark, t, v).as[(Long, String)].collect().toSet
    // row-identical parity, including the SEQUENCE-NUMBER rule: k=3
    // reborn at v3 survives v2's delete; k=50 dies to v4
    assert(viaFormat(t).as[(Long, String)].collect().toSet == scalaRows(),
      "MoR parity with SnapshotTable.read")
    assert(viaFormat(t).filter(col("k") === 3L).as[(Long, String)]
      .collect().toSet == Set((3L, "reborn")),
      "re-inserted rows are out of older deletes' reach via SQL too")
    assert(viaFormat(t).count() == 18) // 20 - 3 dead + 1 reborn... = 18
    // COLUMN PRUNING past the delete key: selecting only `v` still
    // filters on k internally, then serves the requested shape
    assert(viaFormat(t).select("v").as[String].collect().sorted.toSeq
      == SnapshotTable.read(spark, t).select("v").as[String]
        .collect().sorted.toSeq, "prune-below-key-column parity")
    // FILTER PUSHDOWN still reaches the parquet scan under MoR
    val plan = viaFormat(t).filter(col("k") > 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(k,10)") &&
      plan.split("PushedFilters: \\[").last.takeWhile(_ != ']')
        .contains("GreaterThan(k,10)"),
      s"pushdown must survive the MoR connector: $plan")
    // time travel under deletes: v1 pre-dates every delete; v3 sees
    // only v2's
    assert(viaFormat(t, version = 1L).count() == 20)
    assert(viaFormat(t, version = 3L).as[(Long, String)].collect().toSet
      == scalaRows(3L))
    // compaction purges physically — back on the pure columnar path,
    // parity holds
    SnapshotTable.compactSnapshot(spark, t)
    assert(viaFormat(t).as[(Long, String)].collect().toSet == scalaRows())
    assert(viaFormat(t).count() == 18 &&
      viaFormat(t).filter(col("k") === 11L).count() == 0)
  }

  test("equality AND range deletes together: the SQL door reads the full MoR steady state") {
    import spark.implicits._
    val t = mkTable()
    // day-clustered commit so deleteRange can drop whole files
    SnapshotTable.commit(spark, t,
      (0L until 400L).map(i => (i, i / 100L, s"v$i")).toDF("k", "day", "v")
        .repartitionByRange(4, col("day")).sortWithinPartitions("day"),
      statsCols = Seq("day"))
    SnapshotTable.deleteWhere(spark, t, Seq(5L, 150L, 399L).toDF("k"))
    SnapshotTable.deleteRange(spark, t, "day", 0L, 0L) // day 0 dies whole
    def viaScala = SnapshotTable.read(spark, t)
      .as[(Long, Long, String)].collect().toSet
    val got = viaFormat(t).as[(Long, Long, String)].collect().toSet
    assert(got == viaScala, "parity under mixed delete shapes")
    assert(got.size == 298, // 400 - 100 (day 0, incl. k=5) - 2 equality
      s"day 0 gone whole, scattered keys 150/399 gone: ${got.size}")
    assert(!got.exists(_._2 == 0L) && !got.exists(r => r._1 == 150L || r._1 == 399L))
  }

  test("one resolution per load: a commit between inferSchema and getTable cannot mix versions") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 5L).map(i => (i, s"v$i")).toDF("k", "v"))
    // drive the provider's two-phase handshake by hand, with a rival
    // commit (and a deleteWhere) landing in between — the exact race
    // the pinned resolution closes
    val provider = new graft.sources.GraftSnapshotSource
    val opts = new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("path", t))
    val schema = provider.inferSchema(opts)
    SnapshotTable.append(spark, t,
      Seq((100L, "late", 1L)).toDF("k", "v", "extra")) // schema evolves
    SnapshotTable.deleteWhere(spark, t, Seq(0L).toDF("k"))
    val table = provider.getTable(schema, Array.empty,
      new java.util.HashMap(java.util.Map.of("path", t)))
    // the table must be ENTIRELY the pre-commit version: old schema,
    // old file list, no delete applied (the delete post-dates the pin)
    assert(table.schema().fieldNames.toSeq == Seq("k", "v"))
    val scan = table.asInstanceOf[
      org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(opts).build()
    assert(scan.readSchema().fieldNames.toSeq == Seq("k", "v"))
    // a FRESH load on a fresh provider sees the evolved, deleted table
    val fresh = viaFormat(t)
    assert(fresh.columns.toSeq == Seq("k", "v", "extra") &&
      fresh.count() == 5 && fresh.filter(col("k") === 0L).count() == 0)
  }

  test("an IDLE stream re-touches its retention pin from the trigger loop") {
    import spark.implicits._
    val t = mkTable()
    val ckpt = Files.createTempDirectory("snapstream-idlepin").toString
    SnapshotTable.append(spark, t, Seq((1L, "b1")).toDF("k", "tag"))
    val prev = graft.sources.GraftMicroBatchStream.pinRefreshMs
    graft.sources.GraftMicroBatchStream.pinRefreshMs = 1L
    val q = spark.readStream.format("graft-snapshot").load(t)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    try {
      q.processAllAvailable()
      val pin = new java.io.File(s"$t/_graft_meta").listFiles()
        .find(_.getName.startsWith("pin-")).get
      // age the pin as if the table had been quiet for a long time:
      // without the latestOffset refresh, ONLY a new table version
      // would ever bump this mtime again, and vacuum's age sweep would
      // eventually reap a LIVE stream's pin
      val aged = System.currentTimeMillis() - 10L * 60 * 1000
      assert(pin.setLastModified(aged))
      // idle triggers keep firing latestOffset; with the refresh
      // cadence at 1 ms each one re-touches the pin
      val deadline = System.currentTimeMillis() + 10000
      while (pin.lastModified() <= aged + 1000 &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(pin.lastModified() > aged + 1000,
        "an idle-but-live stream's pin mtime must keep moving")
      q.stop()
      // a RESTARTED stream on a quiet table plans no batch — the
      // replay floor must seed from the checkpointed offset
      // (deserializeOffset), else the refresh never engages and the
      // previous process's pin ages out like a dead consumer's
      val q2 = spark.readStream.format("graft-snapshot").load(t)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try {
        q2.processAllAvailable() // no new versions: nothing planned
        val aged2 = System.currentTimeMillis() - 10L * 60 * 1000
        assert(pin.setLastModified(aged2))
        val deadline2 = System.currentTimeMillis() + 10000
        while (pin.lastModified() <= aged2 + 1000 &&
               System.currentTimeMillis() < deadline2) Thread.sleep(100)
        assert(pin.lastModified() > aged2 + 1000,
          "a restarted idle stream must keep its pin fresh too")
      } finally q2.stop()
    } finally {
      if (q.isActive) q.stop()
      graft.sources.GraftMicroBatchStream.pinRefreshMs = prev
    }
  }

  test("binary delete keys match by VALUE through the SQL door; nested key types refuse loudly") {
    import spark.implicits._
    val t = mkTable()
    // binary key column: the internal value is Array[Byte], whose bare
    // JVM equality is REFERENCE equality — without normalization the
    // SQL door's key-set lookup silently matched nothing while the
    // Scala door's <=> anti-join removed the rows (cross-door divergence)
    SnapshotTable.commit(spark, t,
      (0L until 10L).map(i =>
        (Array(i.toByte, (i + 1).toByte), s"v$i")).toDF("kb", "v"))
    SnapshotTable.deleteWhere(spark, t,
      Seq(Array(3.toByte, 4.toByte), Array(7.toByte, 8.toByte)).toDF("kb"))
    val got = viaFormat(t).select("v").as[String].collect().toSet
    val want = SnapshotTable.read(spark, t).select("v").as[String]
      .collect().toSet
    assert(got == want && got.size == 8 &&
      !got.contains("v3") && !got.contains("v7"),
      s"binary keys must remove rows through the SQL door too: $got")
    // nested key type: no value equality on internal rows — refuse
    // loudly with the Scala-door remedy named instead of silently
    // serving undeleted rows
    val t2 = mkTable()
    SnapshotTable.commit(spark, t2,
      Seq((Seq(1L, 2L), "a"), (Seq(3L, 4L), "b")).toDF("ka", "v"))
    SnapshotTable.deleteWhere(spark, t2, Seq(Seq(1L, 2L)).toDF("ka"))
    val e = intercept[UnsupportedOperationException] { viaFormat(t2).count() }
    assert(e.getMessage.contains("nested") &&
      e.getMessage.contains("SnapshotTable.read"), e.getMessage)
    // the Scala door still resolves array keys (null-safe anti-join)
    assert(SnapshotTable.read(spark, t2).select("v").as[String]
      .collect().toSeq == Seq("b"))
    // floating keys: -0.0 vs 0.0 (boxed equality distinguishes the
    // zeros, the SQL comparison and the Scala door's normalized join
    // keys do not) and NaN (equal to itself under Spark's null-safe
    // equality) must behave identically through both doors
    val t3 = mkTable()
    SnapshotTable.commit(spark, t3,
      Seq((-0.0d, "negzero"), (0.0d, "poszero"), (1.5d, "keep"),
        (Double.NaN, "nan")).toDF("kd", "v"))
    SnapshotTable.deleteWhere(spark, t3,
      Seq(0.0d, Double.NaN).toDF("kd"))
    val sqlRows = viaFormat(t3).select("v").as[String].collect().toSet
    val scalaRows = SnapshotTable.read(spark, t3).select("v").as[String]
      .collect().toSet
    assert(sqlRows == scalaRows && sqlRows == Set("keep"),
      s"both zeros AND NaN die through BOTH doors: sql=$sqlRows scala=$scalaRows")
  }

  test("the delete backlog past the broadcast cap is refused with the remedies named") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v"))
    SnapshotTable.deleteWhere(spark, t, (0L until 30L).toDF("k"))
    val prev = SnapshotTable.deleteBroadcastMaxRows
    try {
      SnapshotTable.deleteBroadcastMaxRows = 10L
      val e = intercept[UnsupportedOperationException] { viaFormat(t).count() }
      assert(e.getMessage.contains("compact") &&
        e.getMessage.contains("SnapshotTable.read"), e.getMessage)
    } finally SnapshotTable.deleteBroadcastMaxRows = prev
    // within the cap the same table reads fine
    assert(viaFormat(t).count() == 70)
  }
}
