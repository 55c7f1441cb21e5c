package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The DSv2 WRITE door: `df.write.format("graft-snapshot")` must ride
  * the same claim + ledger machinery as the Scala API — table creation
  * on first append, loud schema evolution, claim-serialized concurrent
  * writers, exactly-once under foreachBatch replay — and a write must
  * NEVER bypass the manifest commit protocol (the raw parquet table's
  * own write path is deliberately unreachable).
  */
class GraftSnapshotWriteSpec extends SparkSpec {

  private def mkTable(): String =
    Files.createTempDirectory("snapwrite").toString + "/t"

  test("save modes: append creates and extends, overwrite replaces, errorifexists/ignore behave") {
    import spark.implicits._
    val t = mkTable()
    // append on a fresh root CREATES the table at v1
    Seq((1L, "a")).toDF("k", "v").write
      .format("graft-snapshot").mode("append").save(t)
    assert(SnapshotTable.currentVersion(spark, t) == 1L)
    Seq((2L, "b")).toDF("k", "v").write
      .format("graft-snapshot").mode("append").save(t)
    assert(SnapshotTable.read(spark, t).as[(Long, String)].collect().toSet
      == Set((1L, "a"), (2L, "b")))
    // writes land through the manifest: the format door reads them back
    assert(spark.read.format("graft-snapshot").load(t).count() == 2)
    // default mode errors on an existing table, naming the alternatives
    val e = intercept[Exception] {
      Seq((3L, "c")).toDF("k", "v").write.format("graft-snapshot").save(t)
    }
    assert(e.getMessage.contains("append") && e.getMessage.contains("overwrite"),
      e.getMessage)
    // ignore is a no-op on an existing table
    Seq((4L, "d")).toDF("k", "v").write
      .format("graft-snapshot").mode("ignore").save(t)
    assert(SnapshotTable.read(spark, t).count() == 2)
    // overwrite = whole-snapshot replace, old version still retained
    Seq((9L, "z")).toDF("k", "v").write
      .format("graft-snapshot").mode("overwrite").save(t)
    assert(SnapshotTable.read(spark, t).as[(Long, String)].collect().toSet
      == Set((9L, "z")))
    assert(SnapshotTable.read(spark, t, 2L).count() == 2, "time travel intact")
  }

  test("schema evolution through the write door: widening appends, loud conflicts") {
    import spark.implicits._
    val t = mkTable()
    Seq((1, "a")).toDF("k", "v").write // k is INT here
      .format("graft-snapshot").mode("append").save(t)
    // new column + k widened int->long: the committed schema evolves,
    // pre-evolution rows serve NULL for the new column
    Seq((2L, "b", 7.5)).toDF("k", "v", "score").write
      .format("graft-snapshot").mode("append").save(t)
    val got = spark.read.format("graft-snapshot").load(t)
    assert(got.columns.toSeq == Seq("k", "v", "score"))
    assert(got.schema("k").dataType.typeName == "long", "int widened to long")
    assert(got.filter(col("score").isNull).count() == 1)
    // an unwidenable type conflict fails LOUDLY, not by footer lottery
    val e = intercept[Exception] {
      Seq(("oops", "c")).toDF("k", "v").write
        .format("graft-snapshot").mode("append").save(t)
    }
    assert(e.getMessage.contains("widens") || e.getMessage.contains("conflict"),
      e.getMessage)
  }

  test("statsCols option records envelopes: pruned reads skip the written files") {
    import spark.implicits._
    val t = mkTable()
    (0 until 4).foreach { d =>
      (0 until 50).map(i => (d * 100L + i, s"d$d")).toDF("ts", "v")
        .coalesce(1).write.format("graft-snapshot")
        .option("statsCols", "ts").mode("append").save(t)
    }
    val pruned = SnapshotTable.readPruned(spark, t, "ts", 100L, 150L)
    assert(pruned.select("v").distinct().as[String].collect().toSeq == Seq("d1"),
      "envelopes from the write option prune to the one matching file")
    assert(pruned.rdd.getNumPartitions <= 2,
      "non-matching files were skipped at manifest resolution")
  }

  test("concurrent writers through the door: claim-serialized, nothing lost") {
    import spark.implicits._
    val t = mkTable()
    Seq((0L, "seed")).toDF("k", "v").write
      .format("graft-snapshot").mode("append").save(t)
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        Seq((i.toLong, s"w$i")).toDF("k", "v").write
          .format("graft-snapshot").mode("append").save(t)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(SnapshotTable.currentVersion(spark, t) == 5L,
      "five appends = five versions, every claim exclusive")
    assert(SnapshotTable.read(spark, t).as[(Long, String)].collect().toSet
      == (0 to 4).map(i => (i.toLong, if (i == 0) "seed" else s"w$i")).toSet,
      "no append lost to a race")
  }

  test("exactly-once from foreachBatch: the sinkId/batchId options thread the ledger") {
    import spark.implicits._
    val t = mkTable()
    def writeBatch(batchId: Long, rows: Seq[(Long, String)]): Unit =
      rows.toDF("k", "v").write.format("graft-snapshot")
        .option("sinkId", "ckpt://sink-1").option("batchId", batchId)
        .mode("append").save(t)
    writeBatch(0L, Seq((1L, "b0")))
    writeBatch(1L, Seq((2L, "b1")))
    // a replay of batch 1 (the crash-between-commit-and-checkpoint
    // shape) must mint NOTHING — not even a byte-identical version
    val before = SnapshotTable.currentVersion(spark, t)
    writeBatch(1L, Seq((2L, "b1")))
    writeBatch(0L, Seq((1L, "b0")))
    assert(SnapshotTable.currentVersion(spark, t) == before,
      "replayed batches are version-level no-ops")
    assert(SnapshotTable.read(spark, t).count() == 2)
    assert(SnapshotTable.lastCommittedBatch(spark, t, "ckpt://sink-1")
      .contains(1L))
    // and it composes with a REAL stream's foreachBatch
    val src = Files.createTempDirectory("snapwrite-src").toString + "/j"
    val ckpt = Files.createTempDirectory("snapwrite-ckpt").toString
    (10L until 15L).map(i => (i, s"s$i")).toDF("k", "v")
      .write.json(src)
    val q = spark.readStream.schema("k LONG, v STRING").json(src)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.format("graft-snapshot")
          .option("sinkId", ckpt).option("batchId", id)
          .mode("append").save(t); ()
      }.start()
    q.processAllAvailable(); q.stop()
    assert(SnapshotTable.read(spark, t).count() == 7)
    assert(SnapshotTable.lastCommittedBatch(spark, t, ckpt).contains(0L))
  }

  test("the raw parquet write door is sealed: a write can never bypass the manifest") {
    import spark.implicits._
    val t = mkTable()
    Seq((1L, "a")).toDF("k", "v").write
      .format("graft-snapshot").mode("append").save(t)
    val filesBefore = SnapshotTable.snapshotFiles(spark, t).toSet
    // whatever route a write takes through the provider, the data tree
    // below the committed version must stay untouched except via a
    // manifest commit — verify the only new artifacts are commits
    Seq((2L, "b")).toDF("k", "v").write
      .format("graft-snapshot").mode("append").save(t)
    val v = SnapshotTable.currentVersion(spark, t)
    assert(v == 2L)
    val filesAfter = SnapshotTable.snapshotFiles(spark, t).toSet
    assert(filesBefore.subsetOf(filesAfter))
    assert((filesAfter -- filesBefore).forall(_.startsWith("data-00002/")),
      "new files land only in the claimed version's directory")
  }
}
