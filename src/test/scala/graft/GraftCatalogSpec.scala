package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The NAMED-table SQL door: a catalog over a warehouse of snapshot
  * tables — `SELECT ... FROM graft_test.ns.tbl`, SQL time travel by
  * version AND wall-clock, merge-on-read through plain SQL, and loud
  * refusals for the mutations that must go through the commit
  * protocol doors.
  */
class GraftCatalogSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-wh-cat").toString

  private def ensureCatalog(): Unit = {
    spark.conf.set("spark.sql.catalog.graft_test",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_test.warehouse", wh)
  }

  test("named SQL reads: SELECT over namespaced snapshot tables, joins included") {
    import spark.implicits._
    ensureCatalog()
    SnapshotTable.commit(spark, s"$wh/events/clicks",
      (0L until 20L).map(i => (i, i % 4, s"c$i")).toDF("id", "user", "tag"))
    SnapshotTable.commit(spark, s"$wh/events/users",
      (0L until 4L).map(u => (u, s"name$u")).toDF("user", "name"))
    assert(spark.sql("SELECT count(*) AS n FROM graft_test.events.clicks")
      .head().getLong(0) == 20)
    // a join across two catalog tables, straight SQL
    val joined = spark.sql(
      """SELECT u.name, count(*) AS n
        |FROM graft_test.events.clicks c
        |JOIN graft_test.events.users u ON c.user = u.user
        |GROUP BY u.name ORDER BY u.name""".stripMargin).collect()
    assert(joined.length == 4 && joined.forall(_.getLong(1) == 5))
    // the DataFrame door too
    assert(spark.table("graft_test.events.clicks").count() == 20)
    // listing surfaces only real snapshot tables
    val listed = spark.sql("SHOW TABLES IN graft_test.events")
      .select("tableName").as[String].collect().toSet
    assert(listed == Set("clicks", "users"), s"listed: $listed")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF resolve the format's history") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/tt/orders"
    SnapshotTable.commit(spark, t, Seq((1L, "v1")).toDF("k", "tag"))
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    SnapshotTable.append(spark, t, Seq((2L, "v2")).toDF("k", "tag"))
    assert(spark.sql("SELECT count(*) FROM graft_test.tt.orders")
      .head().getLong(0) == 2)
    assert(spark.sql(
      "SELECT tag FROM graft_test.tt.orders VERSION AS OF 1")
      .head().getString(0) == "v1")
    // TIMESTAMP AS OF: SQL hands the catalog microseconds; the
    // format's #ts headers resolve the version
    val ts = new java.sql.Timestamp(between)
    assert(spark.sql(
      s"SELECT tag FROM graft_test.tt.orders TIMESTAMP AS OF '$ts'")
      .head().getString(0) == "v1")
  }

  test("merge-on-read through named SQL; mutations refuse toward the protocol doors") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/mor/items"
    SnapshotTable.commit(spark, t,
      (0L until 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    SnapshotTable.deleteWhere(spark, t, Seq(3L, 7L).toDF("k"))
    assert(spark.sql("SELECT k FROM graft_test.mor.items ORDER BY k")
      .as[Long].collect().toSeq == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L),
      "live equality deletes resolve inside the named SQL read")
    // DDL/DML that would bypass the commit protocol refuses loudly
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE graft_test.mor.fresh (k LONG) USING parquet")
    }
    assert(e1.getMessage.contains("graft-snapshot") ||
      e1.getMessage.contains("read-focused"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO graft_test.mor.items VALUES (99, 'x')")
    }
    assert(e2.getMessage.toLowerCase.contains("does not support") ||
      e2.getMessage.toLowerCase.contains("append"), e2.getMessage)
    // a missing table is a catalog-level NoSuchTable, not a path error
    val e3 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_test.mor.ghost").collect()
    }
    assert(e3.getMessage.toLowerCase.contains("table"), e3.getMessage)
    // DROP TABLE works: a catalog op with clear semantics
    SnapshotTable.commit(spark, s"$wh/mor/scratch",
      Seq((1L, "x")).toDF("k", "v"))
    spark.sql("DROP TABLE graft_test.mor.scratch")
    assert(SnapshotTable.currentVersion(spark, s"$wh/mor/scratch") == 0L)
  }
}
