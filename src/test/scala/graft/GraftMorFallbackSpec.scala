package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** Past the DSv2 merge-on-read ceiling the SQL door must DEGRADE, not
  * refuse: with [[graft.sources.GraftSnapshotExtensions]] registered,
  * the marker relation rewrites during analysis into the Scala door's
  * anti-join (hash-partitioned shuffle past the broadcast cap) and
  * returns parity rows; without the extension the refusal stays loud
  * and now names the extension as a remedy.
  */
class GraftMorFallbackSpec extends SparkSpec {

  private def mkTable(): String =
    Files.createTempDirectory("morfallback").toString + "/t"

  /** A table whose certified backlog exceeds the (lowered) spec
    * ceiling: 1000 rows, 50 delete keys, ceiling 10.
    */
  private def mkOversized(): String = {
    import spark.implicits._
    val t = mkTable()
    SnapshotTable.commit(spark, t,
      (0L until 1000L).map(i => (i, s"r$i")).toDF("k", "tag"))
    SnapshotTable.deleteWhere(spark, t, (0L until 50L).map(_ * 3).toDF("k"))
    SnapshotTable.append(spark, t, Seq((3L, "reborn")).toDF("k", "tag"))
    t
  }

  test("with the extension: SQL reads past the ceiling plan the Scala door's shuffled anti-join, parity rows") {
    val t = mkOversized()
    val prevSpec = SnapshotTable.deleteSpecMaxRows
    val prevBcast = SnapshotTable.deleteBroadcastMaxRows
    val old = spark
    // a SECOND SparkSession over the SAME SparkContext, with the
    // extension applied at build time (the only point analyzer rules
    // inject); restored afterwards so later suites see the shared one
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions, not .config("spark.sql.extensions", ...): the
    // conf form is a STATIC conf resolved from the already-running
    // SparkContext, so it cannot take effect for a second session over
    // a shared context — the programmatic hook is the public API for
    // exactly this
    val s2 = SparkSession.builder()
      .withExtensions(new graft.sources.GraftSnapshotExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      // both knobs below the 50-key backlog: the DSv2 ceiling trips AND
      // the Scala door's own anti-join drops its broadcast hint
      SnapshotTable.deleteSpecMaxRows = 10L
      SnapshotTable.deleteBroadcastMaxRows = 10L
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = s2.read.format("graft-snapshot").load(t)
      val plan = finalPlanSection(finalizedPlan(df))
      assert(plan.contains("LeftAnti") &&
        (plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")) &&
        !plan.contains("BroadcastHashJoin"),
        s"past the ceiling the subtraction must SHUFFLE:\n$plan")
      val got = df.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = SnapshotTable.read(s2, t).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == want, "parity with SnapshotTable.read past the ceiling")
      assert(got.size == 951 && got.contains((3L, "reborn")),
        s"1000 - 50 dead + the reborn k=3 (higher sequence number): ${got.size}")
      // filters compose above the rewritten plan: k<10 leaves
      // {1,2,4,5,7,8} (0,3,6,9 deleted) plus the reborn k=3
      assert(df.filter(col("k") < 10L).count() == 7,
        "filtered read over the fallback plan")
    } finally {
      SnapshotTable.deleteSpecMaxRows = prevSpec
      SnapshotTable.deleteBroadcastMaxRows = prevBcast
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("WITH the extension registered, DML on a past-the-ceiling table keeps working: command targets are not rewritten") {
    import spark.implicits._
    val wh = Files.createTempDirectory("morfb-ext-wh").toString
    val t = s"$wh/fb/t"
    SnapshotTable.commit(spark, t,
      (0L until 100L).map(i => (i, s"r$i")).toDF("k", "tag"))
    SnapshotTable.deleteWhere(spark, t, (0L until 30L).toDF("k"))
    val prevSpec = SnapshotTable.deleteSpecMaxRows
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new graft.sources.GraftSnapshotExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      s2.conf.set("spark.sql.catalog.graft_fbx", "graft.sources.GraftCatalog")
      s2.conf.set("spark.sql.catalog.graft_fbx.warehouse", wh)
      SnapshotTable.deleteSpecMaxRows = 10L
      // the extension rule must rewrite READS only: a DeleteFromTable's
      // target is a plan child of the command, and rewriting it hands
      // Spark a Project where it expects a table relation
      // ([INTERNAL_ERROR]) — the pre-fix behavior this pins against
      s2.sql("DELETE FROM graft_fbx.fb.t WHERE k = 99")
      assert(SnapshotTable.commitOp(s2, t).contains("delete"))
      s2.sql("INSERT INTO graft_fbx.fb.t VALUES (500, 'late')")
      assert(SnapshotTable.commitOp(s2, t).contains("append"))
      // ...while an INSERT whose QUERY reads the over-ceiling table
      // still rewrites that read side (V2WriteCommand.query)
      val t2 = s"$wh/fb/copy"
      SnapshotTable.commit(s2, t2, Seq((-1L, "seed")).toDF("k", "tag"))
      s2.sql("INSERT INTO graft_fbx.fb.copy " +
        "SELECT k, tag FROM graft_fbx.fb.t WHERE k >= 490")
      assert(SnapshotTable.read(s2, t2).as[(Long, String)].collect().toSet ==
        Set((-1L, "seed"), (500L, "late")),
        "the over-ceiling read under INSERT INTO ... SELECT planned " +
          "through the fallback rewrite")
      // and a plain read in the same session still degrades to the
      // shuffled anti-join rather than refusing
      assert(s2.sql("SELECT count(*) FROM graft_fbx.fb.t").head().getLong(0)
        == 70L) // 100 - 30 - 1(k=99) + 1(k=500)
    } finally {
      SnapshotTable.deleteSpecMaxRows = prevSpec
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("past the ceiling, catalog INSERT and DELETE keep working: writes don't read") {
    import spark.implicits._
    val wh = Files.createTempDirectory("morfb-wh").toString
    spark.conf.set("spark.sql.catalog.graft_fb", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_fb.warehouse", wh)
    val t = s"$wh/fb/t"
    SnapshotTable.commit(spark, t,
      (0L until 100L).map(i => (i, s"r$i")).toDF("k", "tag"))
    SnapshotTable.deleteWhere(spark, t, (0L until 30L).toDF("k"))
    val prevSpec = SnapshotTable.deleteSpecMaxRows
    try {
      SnapshotTable.deleteSpecMaxRows = 10L
      // reads refuse in this extension-less session...
      intercept[UnsupportedOperationException] {
        spark.sql("SELECT count(*) FROM graft_fb.fb.t").collect()
      }
      // ...but DML must NOT break exactly when the table most needs
      // maintenance commits: appends land at a higher sequence number,
      // a DELETE only grows the backlog compaction will purge
      spark.sql("INSERT INTO graft_fb.fb.t VALUES (500, 'late')")
      assert(SnapshotTable.commitOp(spark, t).contains("append"))
      spark.sql("DELETE FROM graft_fb.fb.t WHERE k = 99")
      assert(SnapshotTable.commitOp(spark, t).contains("delete"))
    } finally SnapshotTable.deleteSpecMaxRows = prevSpec
    // with the ceiling back, the Scala door confirms both mutations
    val rows = SnapshotTable.read(spark, t).as[(Long, String)].collect().toSet
    assert(rows.contains((500L, "late")) && !rows.exists(_._1 == 99L) &&
      rows.size == 70) // 100 - 30 - 1(k=99) + 1(k=500)
  }

  test("without the extension: the refusal stays loud and names the extension, compaction, and the Scala door") {
    val t = mkOversized()
    val prevSpec = SnapshotTable.deleteSpecMaxRows
    try {
      SnapshotTable.deleteSpecMaxRows = 10L
      val e = intercept[UnsupportedOperationException] {
        spark.read.format("graft-snapshot").load(t).count()
      }
      assert(e.getMessage.contains("GraftSnapshotExtensions") &&
        e.getMessage.contains("compact") &&
        e.getMessage.contains("SnapshotTable.read"), e.getMessage)
    } finally SnapshotTable.deleteSpecMaxRows = prevSpec
  }
}
