package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{CommitPrimitive, CreateExclusive, SnapshotTable}

/** Round-13 lifecycle contracts on the snapshot table: commit
  * timestamps (history wall-clock + time travel by timestamp +
  * duration-based vacuum), consumer retention pins (an aggressive
  * vacuum cannot break a lagging consumer's replay; dead pins age
  * out), the deleteRange null-survival rule, compactSnapshot's
  * conditional commit (a racing sink append is never erased), and the
  * delete-backlog broadcast guard's shuffled-anti-join fallback.
  */
class SnapshotLifecycleSpec extends SparkSpec {

  private def mkTable(): String =
    Files.createTempDirectory("snaplife").toString + "/t"

  test("commit timestamps: history wall-clock + versionAt time travel by timestamp") {
    import spark.implicits._
    val t = mkTable()
    val before = System.currentTimeMillis() - 1
    SnapshotTable.commit(spark, t, Seq((1L, "v1")).toDF("k", "tag"))
    Thread.sleep(15)
    val betweenV1V2 = System.currentTimeMillis()
    Thread.sleep(15)
    SnapshotTable.commit(spark, t, Seq((2L, "v2")).toDF("k", "tag"))
    val ts = (1L to 2L).map(v => SnapshotTable.commitTimestamp(spark, t, v))
    assert(ts.forall(_.isDefined), s"every commit is #ts-stamped: $ts")
    assert(ts(0).get <= ts(1).get, "timestamps are monotone with versions")
    // history surfaces the same stamps
    val hist = SnapshotTable.history(spark, t)
    assert(hist.map(_.version) == Seq(2L, 1L) &&
      hist.map(_.timestampMs) == Seq(ts(1), ts(0)))
    // time travel by timestamp = the same resolution as by number
    assert(SnapshotTable.versionAt(spark, t, betweenV1V2) == 1L)
    assert(SnapshotTable.versionAt(spark, t, System.currentTimeMillis()) == 2L)
    assert(SnapshotTable.read(spark, t,
      SnapshotTable.versionAt(spark, t, betweenV1V2))
      .select("tag").head().getString(0) == "v1")
    // asking for history older than the table errors loudly
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.versionAt(spark, t, before - 1000)
    }
    assert(e.getMessage.contains("at or before"), e.getMessage)
  }

  test("vacuum retainFor: duration-based retention keeps the window, sweeps beyond it") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t, Seq((1L, "old")).toDF("k", "tag"))
    Thread.sleep(400)
    SnapshotTable.commit(spark, t, Seq((2L, "mid")).toDF("k", "tag"))
    SnapshotTable.commit(spark, t, Seq((3L, "new")).toDF("k", "tag"))
    // a window covering everything keeps every version despite retain=1
    SnapshotTable.vacuum(spark, t, retain = 1, retainForMs = 3600 * 1000L)
    assert(SnapshotTable.history(spark, t).map(_.version) == Seq(3L, 2L, 1L),
      "inside the window nothing is swept")
    // a window covering only the recent pair sweeps v1, keeps v2+v3
    val cutoff = System.currentTimeMillis() -
      SnapshotTable.commitTimestamp(spark, t, 2L).get + 50
    SnapshotTable.vacuum(spark, t, retain = 1, retainForMs = cutoff)
    assert(SnapshotTable.history(spark, t).map(_.version) == Seq(3L, 2L),
      "v1 aged out of the duration window")
    assert(SnapshotTable.read(spark, t, 2L).count() == 1, "kept versions read")
  }

  test("consumer pins: aggressive vacuum cannot break a lagging consumer; dead pins age out") {
    import spark.implicits._
    val t = mkTable()
    (1 to 4).foreach { i =>
      SnapshotTable.append(spark, t, Seq((i.toLong, s"b$i")).toDF("k", "tag"))
    }
    // a consumer committed through v2 and is lagging
    SnapshotTable.pinVersion(spark, t, "ckpt://consumer-a", 2L)
    assert(SnapshotTable.pinnedVersions(spark, t).values.toSeq == Seq(2L))
    SnapshotTable.vacuum(spark, t, retain = 1)
    assert(SnapshotTable.history(spark, t).map(_.version) == Seq(4L, 3L, 2L),
      "the pin held v2..v4 against retain=1; v1 swept")
    // the consumer's replay window still resolves: diff (2, 4]
    assert(SnapshotTable.readAdded(spark, t, 2L, 4L)
      .select("tag").as[String].collect().toSet == Set("b3", "b4"))
    // pins never lower: a stale re-pin at v1 is ignored
    SnapshotTable.pinVersion(spark, t, "ckpt://consumer-a", 2L)
    SnapshotTable.pinVersion(spark, t, "ckpt://consumer-a", 3L)
    assert(SnapshotTable.pinnedVersions(spark, t).values.toSeq == Seq(3L))
    // a DEAD consumer's pin (mtime past pinMaxAgeMs) is swept and
    // stops holding history
    val pinFile = new java.io.File(s"$t/_graft_meta").listFiles()
      .find(_.getName.startsWith("pin-")).get
    assert(pinFile.setLastModified(
      System.currentTimeMillis() - 8L * 24 * 3600 * 1000))
    SnapshotTable.vacuum(spark, t, retain = 1)
    assert(SnapshotTable.pinnedVersions(spark, t).isEmpty, "dead pin swept")
    assert(SnapshotTable.history(spark, t).map(_.version) == Seq(4L),
      "with the pin gone, retain=1 rules again")
    // explicit unpin for decommissioned consumers
    SnapshotTable.pinVersion(spark, t, "ckpt://consumer-b", 4L)
    SnapshotTable.unpin(spark, t, "ckpt://consumer-b")
    assert(SnapshotTable.pinnedVersions(spark, t).isEmpty)
  }

  test("deleteRange: null range values SURVIVE boundary rewrites (SQL DELETE semantics)") {
    import spark.implicits._
    val t = mkTable()
    // one boundary file mixing null and non-null ts, plus an ALL-null
    // file (no envelope -> classified boundary on every range delete)
    SnapshotTable.commit(spark, t,
      ((0L until 10L).map(i => (i, Some(i))) ++
        Seq((100L, None), (101L, None))).toDF("k", "ts").coalesce(1),
      statsCols = Seq("ts"))
    SnapshotTable.append(spark, t,
      Seq((200L, None: Option[Long]), (201L, None)).toDF("k", "ts").coalesce(1),
      statsCols = Seq("ts"))
    val v = SnapshotTable.deleteRange(spark, t, "ts", 0L, 4L)
    assert(v > 0L)
    val got = SnapshotTable.read(spark, t).as[(Long, Option[Long])]
      .collect().toSet
    val want = ((5L until 10L).map(i => (i, Some(i))) ++
      Seq((100L, None), (101L, None), (200L, None), (201L, None))).toSet
    assert(got == want,
      s"ts in [0,4] deleted; EVERY null-ts row survives: ${got.toSeq.sorted}")
    // repeat on the same table: the rewritten all-null rows still have
    // no envelope (boundary again) and must still survive
    SnapshotTable.deleteRange(spark, t, "ts", 5L, 6L)
    assert(SnapshotTable.read(spark, t).filter(col("ts").isNull).count() == 4,
      "all four null-ts rows survive a second boundary rewrite too")
  }

  test("deleteRange: a leaf folding an all-null file with a MIXED file is no all-null certificate") {
    import spark.implicits._
    val t = mkTable()
    // file A: 5 rows, ALL null ts (tokens: __nn_ts=5..5, __rows=5..5,
    // no ts envelope); file B: 7 rows, 5 null + 2 IN-RANGE values
    // (ts=10,11; tokens: ts=10..11, __nn_ts=5..5, __rows=7..7)
    SnapshotTable.append(spark, t,
      (0L until 5L).map(i => (i, None: Option[Long])).toDF("k", "ts")
        .coalesce(1), statsCols = Seq("ts"))
    SnapshotTable.append(spark, t,
      ((100L until 105L).map(i => (i, None: Option[Long])) ++
        Seq((200L, Some(10L)), (201L, Some(11L)))).toDF("k", "ts")
        .coalesce(1), statsCols = Seq("ts"))
    // fold BOTH files into one merged leaf: its aggregate tokens are
    // __nn_ts=5..5, __rows=5..7 — the exact shape the pre-fix
    // certificate (null envelope vs rows.lo) wrongly certified as
    // all-null-disjoint, carrying the leaf verbatim
    assert(SnapshotTable.rewriteManifests(spark, t, groupSize = 2) > 0L)
    val v = SnapshotTable.deleteRange(spark, t, "ts", 0L, 20L)
    assert(v > 0L)
    val got = SnapshotTable.read(spark, t).as[(Long, Option[Long])]
      .collect().toSet
    val want = ((0L until 5L).map(i => (i, None: Option[Long])) ++
      (100L until 105L).map(i => (i, None: Option[Long]))).toSet
    assert(got == want,
      s"the folded leaf's in-range rows (ts=10,11) must NOT survive the " +
        s"range delete; every null row must: ${got.toSeq.sortBy(_._1)}")
  }

  test("compactSnapshot is a CONDITIONAL commit: a sink append racing it is never erased") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.append(spark, t,
      (0L until 50L).map(i => (i, "base")).toDF("k", "tag"),
      ledger = Some(("sinkA", 1L)))
    // inject a rival sink append INSIDE the compaction's claim window —
    // exactly the interleaving that silently erased the rival's rows
    // and ledger entry under the old unconditional commit
    @volatile var injected = false
    SnapshotTable.claimPrimitive = new CommitPrimitive {
      def tryClaim(f: org.apache.hadoop.fs.FileSystem,
                   path: org.apache.hadoop.fs.Path): Boolean = {
        if (!injected && path.getName.startsWith("claim-")) {
          injected = true
          SnapshotTable.append(spark, t,
            Seq((999L, "racer")).toDF("k", "tag"),
            ledger = Some(("sinkA", 2L)))
        }
        CreateExclusive.tryClaim(f, path)
      }
      def release(f: org.apache.hadoop.fs.FileSystem,
                  path: org.apache.hadoop.fs.Path): Unit =
        CreateExclusive.release(f, path)
    }
    try {
      val v = SnapshotTable.compactSnapshot(spark, t)
      assert(v > 0L)
    } finally SnapshotTable.claimPrimitive = CreateExclusive
    assert(injected, "the race actually ran")
    val rows = SnapshotTable.read(spark, t)
    assert(rows.count() == 51 &&
      rows.filter(col("tag") === "racer").count() == 1,
      "the racing append's rows survived the compaction")
    assert(SnapshotTable.lastCommittedBatch(spark, t, "sinkA").contains(2L),
      "the racing append's LEDGER entry survived — replays still skip")
  }

  test("delete backlog past the broadcast cap degrades to a shuffled anti-join, same rows") {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 1000L).map(i => (i, s"r$i")).toDF("k", "tag"))
    SnapshotTable.deleteWhere(spark, t,
      (0L until 50L).map(i => i * 3).toDF("k"))
    val prevCap = SnapshotTable.deleteBroadcastMaxRows
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // kill Spark's own size-based broadcast so the HINT is the only
      // broadcast path — the guard's choice becomes plan-visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // under the cap: the hint broadcasts the delete keys
      val hinted = finalPlanSection(
        finalizedPlan(SnapshotTable.read(spark, t)))
      assert(hinted.contains("BroadcastHashJoin") && hinted.contains("LeftAnti"),
        s"certified backlog (50 keys) <= cap -> broadcast anti-join:\n$hinted")
      // past the cap: no hint — the anti-join shuffles instead of
      // OOMing the driver on an unbounded backlog
      SnapshotTable.deleteBroadcastMaxRows = 10L
      val df = SnapshotTable.read(spark, t)
      val shuffled = finalPlanSection(finalizedPlan(df))
      assert(!shuffled.contains("BroadcastHashJoin"),
        s"backlog 50 > cap 10 -> no broadcast hint:\n$shuffled")
      assert(shuffled.contains("SortMergeJoin") ||
        shuffled.contains("ShuffledHashJoin"), s"shuffled anti:\n$shuffled")
      assert(df.count() == 950 &&
        df.filter(col("k") % 3 === 0 && col("k") < 150).count() == 0,
        "both modes delete exactly the keyed rows")
    } finally {
      SnapshotTable.deleteBroadcastMaxRows = prevCap
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
