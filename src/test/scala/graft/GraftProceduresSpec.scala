package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Maintenance through SQL `CALL graft.system.<op>(...)`: each
  * procedure is a veneer over the corresponding [[SnapshotTable]] op —
  * the semantics (compaction purging deletes, vacuum respecting pins)
  * are asserted through the SQL door, plus the loud unknown-procedure
  * refusal and SHOW PROCEDURES.
  */
class GraftProceduresSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-wh-proc").toString

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_p", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_p.warehouse", wh)
  }

  test("CALL compact purges the delete backlog; vacuum sweeps superseded versions") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/ops/t1"
    SnapshotTable.commit(spark, t,
      (0L until 100L).map(i => (i, s"r$i")).toDF("k", "tag"))
    SnapshotTable.deleteWhere(spark, t, Seq(1L, 2L, 3L).toDF("k"))
    // a live equality-delete backlog is visible as @delete manifest
    // lines; compaction must purge them physically
    def deleteLines(): Int = {
      val v = SnapshotTable.currentVersion(spark, t)
      val src = scala.io.Source.fromFile(
        f"$t/_graft_meta/manifest-$v%05d", "UTF-8")
      try src.getLines().count(_.startsWith("@delete")) finally src.close()
    }
    assert(deleteLines() > 0, "live equality deletes before compaction")
    val v = spark.sql("CALL graft_p.system.compact(table => 'ops.t1')")
      .head().getLong(0)
    assert(v == 3L, s"compaction committed v3, got $v")
    assert(deleteLines() == 0 &&
      SnapshotTable.read(spark, t).count() == 97,
      "the backlog is purged physically, rows intact")
    val removed = spark
      .sql("CALL graft_p.system.vacuum(table => 'ops.t1', retain => 1)")
      .head().getLong(0)
    assert(removed > 0L, "superseded versions swept")
    assert(SnapshotTable.read(spark, t).count() == 97)
  }

  test("CALL rewrite_manifests folds the top manifest; defaults apply; results are one-row frames") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/ops/t2"
    (1 to 6).foreach { i =>
      SnapshotTable.append(spark, t, Seq((i.toLong, s"b$i")).toDF("k", "tag"))
    }
    val df = spark.sql(
      "CALL graft_p.system.rewrite_manifests(table => 'ops.t2', group_size => 3)")
    assert(df.columns.toSeq == Seq("version") && df.count() == 1)
    assert(SnapshotTable.read(spark, t).count() == 6, "pure metadata commit")
    // release_stale_claims with nothing stale: 0 released
    assert(spark.sql(
      "CALL graft_p.system.release_stale_claims(table => 'ops.t2', older_than_ms => 0)")
      .head().getLong(0) == 0L)
  }

  test("CALL history and pins: multi-row inspection result sets through SQL") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/ops/t3"
    SnapshotTable.append(spark, t, Seq((1L, "a")).toDF("k", "tag"))
    SnapshotTable.append(spark, t, Seq((2L, "b")).toDF("k", "tag"))
    SnapshotTable.deleteWhere(spark, t, Seq(1L).toDF("k"))
    val h = spark.sql("CALL graft_p.system.history(table => 'ops.t3')")
    assert(h.columns.toSeq == Seq("version", "timestamp_ms", "op",
      "files", "delete_files", "rows"))
    val ops = h.select("version", "op").collect()
      .map(r => (r.getLong(0), r.getString(2 - 1))).toSeq
    assert(ops == Seq((3L, "delete"), (2L, "append"), (1L, "append")),
      s"newest first with op stamps: $ops")
    // pins: a streaming consumer's pin shows up, unpin removes it
    val got = new scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-snapshot").load(t)
      .writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("proc-pin").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got += df.count() }; ()
      }
      .start()
    q.processAllAvailable(); q.stop()
    val pins = spark.sql("CALL graft_p.system.pins(table => 'ops.t3')")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pins.nonEmpty, "the stream left a retention pin")
    val remaining = spark.sql(
      s"CALL graft_p.system.unpin(table => 'ops.t3', consumer_id => '${pins.head._1}')")
      .head().getLong(0)
    assert(remaining == pins.size - 1L,
      "unpin returns the remaining pin count")
  }

  test("CALL compact preserves the table's stat envelopes (the silent-wipe regression)") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/ops/t4"
    SnapshotTable.commit(spark, t,
      (0L until 50L).map(i => (i, i / 10, s"r$i")).toDF("k", "day", "v"),
      statsCols = Seq("k", "day"))
    spark.sql("CALL graft_p.system.compact(table => 'ops.t4')")
    assert(SnapshotTable.statsColsOf(spark, t).sorted == Seq("day", "k"),
      "compaction must carry the stat columns, not wipe them")
  }

  test("path-escape arguments refuse; unpin of nothing refuses; wedged v0 tables are releasable") {
    import spark.implicits._
    ensureCatalog()
    def rootMsg(x: Throwable): String =
      if (x.getCause == null) x.getMessage
      else x.getMessage + "\n" + rootMsg(x.getCause)
    val t5 = s"$wh/ops/t5"
    SnapshotTable.commit(spark, t5, Seq((1L, "a")).toDF("k", "tag"))
    // table args with traversal segments refuse before any fs touch
    val esc = intercept[Exception] {
      spark.sql("CALL graft_p.system.vacuum(table => '../../etc/passwd')")
    }
    assert(rootMsg(esc).contains("path-escape"), rootMsg(esc))
    // a pin "name" with separators refuses (it could address a manifest)
    val trav = intercept[Exception] {
      spark.sql(
        "CALL graft_p.system.unpin(table => 'ops.t5', consumer_id => 'pin-x/../manifest-00001')")
    }
    assert(rootMsg(trav).contains("no pin file or consumer id"),
      s"traversal pin name must not delete anything: ${rootMsg(trav)}")
    assert(SnapshotTable.currentVersion(spark, t5) == 1L,
      "the manifest survived the traversal attempt")
    // unpin of an unknown consumer refuses instead of no-opping
    val none = intercept[Exception] {
      spark.sql(
        "CALL graft_p.system.unpin(table => 'ops.t5', consumer_id => 'ghost')")
    }
    assert(rootMsg(none).contains("no pin file or consumer id"), rootMsg(none))
    // a table wedged at v0 by a stale claim: release_stale_claims works
    // without a committed snapshot (the state it exists to fix)
    val wedged = s"$wh/ops/wedged"
    val f = new org.apache.hadoop.fs.Path(wedged)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$wedged/_graft_meta"))
    val claim = new org.apache.hadoop.fs.Path(s"$wedged/_graft_meta/claim-00001")
    f.create(claim, true).close()
    Thread.sleep(20)
    val released = spark.sql(
      "CALL graft_p.system.release_stale_claims(table => 'ops.wedged', older_than_ms => 1)")
      .head().getLong(0)
    assert(released == 1L && !f.exists(claim),
      "the stale first-commit claim is released through SQL")
  }

  test("unknown procedures and missing tables refuse loudly; SHOW PROCEDURES lists the surface") {
    ensureCatalog()
    def rootMsg(x: Throwable): String =
      if (x.getCause == null) x.getMessage
      else x.getMessage + "\n" + rootMsg(x.getCause)
    val e1 = intercept[Exception] {
      spark.sql("CALL graft_p.system.defragment(table => 'ops.t1')")
    }
    assert(rootMsg(e1).contains("compact"),
      s"the refusal lists the available procedures: ${rootMsg(e1)}")
    val e2 = intercept[Exception] {
      spark.sql("CALL graft_p.system.compact(table => 'ops.nosuch')")
    }
    assert(rootMsg(e2).contains("no committed snapshot"), rootMsg(e2))
    val listed = spark.sql("SHOW PROCEDURES IN graft_p.system")
      .collect().map(_.mkString(".")).mkString("\n")
    assert(listed.contains("compact") && listed.contains("vacuum"),
      s"SHOW PROCEDURES: $listed")
  }
}
