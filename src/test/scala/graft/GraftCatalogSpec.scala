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
    // DDL that would bypass the commit protocol refuses loudly
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE graft_test.mor.fresh (k LONG) USING parquet")
    }
    assert(e1.getMessage.contains("graft-snapshot") ||
      e1.getMessage.contains("read-focused"), e1.getMessage)
    // row-level SQL UPDATE/MERGE still refuse (scoped merges are the
    // Scala API's semantics)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE graft_test.mor.items SET v = 'x' WHERE k = 1")
    }
    assert(e2.getMessage.toLowerCase.contains("update") ||
      e2.getMessage.toLowerCase.contains("support"), e2.getMessage)
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

  test("INSERT INTO / INSERT OVERWRITE ride the commit protocol; unsafe casts refuse") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/dml/sales"
    SnapshotTable.append(spark, t,
      (0L until 5L).map(i => (i, s"v$i")).toDF("k", "v"))
    spark.sql("INSERT INTO graft_test.dml.sales VALUES (100, 'ins1'), (101, 'ins2')")
    assert(SnapshotTable.currentVersion(spark, t) == 2L &&
      SnapshotTable.commitOp(spark, t).contains("append"),
      "INSERT INTO = a protocol append commit")
    assert(spark.table("graft_test.dml.sales").count() == 7)
    // INSERT from a SELECT over another catalog table
    spark.sql("INSERT INTO graft_test.dml.sales " +
      "SELECT k + 200, v FROM graft_test.dml.sales WHERE k < 2")
    assert(spark.table("graft_test.dml.sales").count() == 9)
    // INSERT OVERWRITE = whole-snapshot replace (ledger semantics of
    // commit; op stamped replace)
    spark.sql("INSERT OVERWRITE graft_test.dml.sales VALUES (7, 'only')")
    assert(spark.table("graft_test.dml.sales").as[(Long, String)]
      .collect().toSeq == Seq((7L, "only")))
    assert(SnapshotTable.commitOp(spark, t).contains("replace"))
    // time travel still sees the pre-overwrite snapshot
    assert(spark.sql(
      "SELECT count(*) FROM graft_test.dml.sales VERSION AS OF 3")
      .head().getLong(0) == 9)
    // ANSI store assignment: a string into the BIGINT column refuses
    // at analysis — INSERT cannot evolve or corrupt the schema
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft_test.dml.sales VALUES ('oops', 'x')")
    }
    assert(e.getMessage.toLowerCase.contains("cast") ||
      e.getMessage.toLowerCase.contains("incompatible"), e.getMessage)
    // INSERT under LIVE deletes: appended rows are out of their reach
    SnapshotTable.deleteWhere(spark, t, Seq(7L).toDF("k"))
    spark.sql("INSERT INTO graft_test.dml.sales VALUES (7, 'reborn')")
    assert(spark.table("graft_test.dml.sales").as[(Long, String)]
      .collect().toSeq == Seq((7L, "reborn")),
      "the re-inserted key survives the older equality delete")
  }

  test("SQL DELETE maps onto the format's own shapes: keys → deleteWhere, ranges → deleteRange") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/dml/del"
    // day-clustered with envelopes so the range shape can drop whole
    // files metadata-only; one null-day row to pin null survival
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "50")
    try SnapshotTable.commit(spark, t,
      ((0L until 200L).map(i => (i, Some(i / 50L), s"v$i")) :+
        ((999L, None: Option[Long], "nullday")))
        .toDF("k", "day", "v")
        .repartitionByRange(4, col("day")).sortWithinPartitions("day"),
      statsCols = Seq("day"))
    finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    // equality → ONE equality-delete commit (merge-on-read keys)
    spark.sql("DELETE FROM graft_test.dml.del WHERE k = 7")
    assert(SnapshotTable.commitOp(spark, t).contains("delete"),
      "an equality DELETE is a deleteWhere commit")
    assert(spark.table("graft_test.dml.del").filter(col("k") === 7L).count() == 0)
    // composite: IN × equality cross-product keys
    spark.sql("DELETE FROM graft_test.dml.del WHERE k IN (10, 11) AND v = 'v10'")
    assert(spark.table("graft_test.dml.del")
      .filter(col("k").isin(10L, 11L)).select("v").as[String]
      .collect().toSeq == Seq("v11"),
      "only the (10,'v10') composite key dies; (11,'v11') survives")
    // range on the clustered column → deleteRange (metadata-priced)
    val filesBefore = SnapshotTable.snapshotFiles(spark, t).size
    spark.sql("DELETE FROM graft_test.dml.del WHERE day >= 0 AND day <= 1")
    assert(SnapshotTable.commitOp(spark, t).contains("deleteRange"),
      "a range DELETE is a deleteRange commit")
    assert(SnapshotTable.snapshotFiles(spark, t).size < filesBefore,
      "in-envelope files dropped from the manifest")
    val left = spark.table("graft_test.dml.del")
    assert(left.filter(col("day") < 2L).count() == 0 &&
      left.filter(col("day").isNull).count() == 1,
      "days 0-1 gone; the null-day row SURVIVES (SQL DELETE semantics)")
    assert(left.count() == 101, // days 2-3 (k 100..199) + the null-day row
      s"surviving rows: ${left.count()}")
    // unsupported shapes refuse at analysis toward the Scala API
    val e = intercept[Exception] {
      spark.sql("DELETE FROM graft_test.dml.del WHERE v LIKE 'v1%'")
    }
    assert(e.getMessage.toLowerCase.contains("delete"), e.getMessage)
    // TRUNCATE would commit an empty snapshot — refused, doors named
    val e2 = intercept[Exception] {
      spark.sql("TRUNCATE TABLE graft_test.dml.del")
    }
    assert(e2.getMessage.contains("INSERT OVERWRITE") &&
      e2.getMessage.contains("DROP TABLE"), e2.getMessage)
  }

  test("the IN-list cross-product cap saturates: a Long-wrapping product refuses instead of materializing") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/dml/ofl"
    SnapshotTable.commit(spark, t,
      Seq((1L, 1L, 1L, 1L, "x")).toDF("a", "b", "c", "d", "v"))
    // a modest oversize refuses through SQL (400 × 300 = 120k > 100k)
    val inA = (0 until 400).mkString(", ")
    val inB = (0 until 300).mkString(", ")
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM graft_test.dml.ofl " +
        s"WHERE a IN ($inA) AND b IN ($inB)")
    }
    assert(e.getMessage.toLowerCase.contains("delete"), e.getMessage)
    // the adversarial shape: 65536^4 = 2^64 ≡ 0 as a wrapping Long
    // product — the pre-fix `.product <= cap` PASSED it and the driver
    // materialized the cross product; the saturating fold must refuse.
    // Asserted at the SupportsDelete seam (the SQL literal list would
    // be megabytes of text for no extra coverage).
    val cat = spark.sessionState.catalogManager.catalog("graft_test")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val tbl = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("dml"), "ofl"))
    val big: Array[Any] = (0 until 65536).map(i => i.toLong: Any).toArray
    val filters: Array[org.apache.spark.sql.sources.Filter] =
      Array("a", "b", "c", "d")
        .map(c => org.apache.spark.sql.sources.In(c, big))
    assert(!tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsDelete]
      .canDeleteWhere(filters),
      "2^64-wrapping IN cross product must refuse, not slip under the cap")
  }

  test("SQL writes carry the table's stat columns forward: INSERT and OVERWRITE keep envelopes alive") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/dml/stats"
    SnapshotTable.commit(spark, t,
      (0L until 100L).map(i => (i, i / 25L, s"v$i")).toDF("k", "day", "v")
        .repartitionByRange(4, col("day")).sortWithinPartitions("day"),
      statsCols = Seq("day"))
    assert(SnapshotTable.statsColsOf(spark, t) == Seq("day"))
    // INSERT INTO: the appended file must carry a day envelope
    spark.sql("INSERT INTO graft_test.dml.stats VALUES (999, 9, 'late')")
    assert(SnapshotTable.statsColsOf(spark, t) == Seq("day"))
    assert(SnapshotTable.snapshotEntries(spark, t)
      .forall(_.stats.contains("day")),
      "every file (incl. the SQL-written one) carries the day envelope")
    // INSERT OVERWRITE is the dangerous one: statsCols = Nil here
    // would drop envelopes TABLE-wide in one statement
    spark.sql("INSERT OVERWRITE graft_test.dml.stats " +
      "SELECT k, day, v FROM graft_test.dml.stats WHERE day < 9")
    assert(SnapshotTable.statsColsOf(spark, t) == Seq("day"),
      "OVERWRITE must not silently disable envelope pruning")
    assert(SnapshotTable.snapshotEntries(spark, t)
      .forall(_.stats.contains("day")))
    // readPruned still works post-OVERWRITE (the behavioral payoff)
    assert(SnapshotTable.readPruned(spark, t, "day", 2L, 2L).count() == 25)
  }

  test("concurrent INSERTs race through the claim protocol: both land, none lost") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/dml/race"
    SnapshotTable.append(spark, t, Seq((0L, "base")).toDF("k", "v"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val inserts = (1 to 4).map { i =>
      Future {
        spark.sql(s"INSERT INTO graft_test.dml.race VALUES ($i, 'w$i')")
      }
    }
    Await.result(Future.sequence(inserts), 120.seconds)
    assert(spark.table("graft_test.dml.race").count() == 5,
      "every racing INSERT committed exactly once")
    assert(SnapshotTable.currentVersion(spark, t) == 5L,
      "four appends after the base = five versions")
  }

  test("CTAS lands version 1 through the claim protocol; statsCols TBLPROPERTY records envelopes") {
    ensureCatalog()
    spark.sql(
      """CREATE TABLE graft_test.ctas.t1
        |TBLPROPERTIES ('statsCols' = 'id')
        |AS SELECT id, id % 4 AS bucket, concat('r', id) AS tag
        |FROM range(0, 100)""".stripMargin)
    val t = s"$wh/ctas/t1"
    assert(SnapshotTable.currentVersion(spark, t) == 1L, "CTAS lands v1")
    assert(spark.sql("SELECT count(*) FROM graft_test.ctas.t1")
      .head().getLong(0) == 100)
    assert(SnapshotTable.commitOp(spark, t).contains("append"))
    assert(SnapshotTable.statsColsOf(spark, t) == Seq("id"),
      "the TBLPROPERTY became real manifest envelopes")
    // CTAS onto an existing table refuses; plain CREATE TABLE refuses
    // toward the data-carrying doors
    intercept[Exception] {
      spark.sql("CREATE TABLE graft_test.ctas.t1 AS SELECT 1 AS x")
    }
    val plain = intercept[Exception] {
      spark.sql("CREATE TABLE graft_test.ctas.t2 (x BIGINT)")
    }
    def rootMsg(x: Throwable): String =
      if (x.getCause == null) x.getMessage
      else x.getMessage + rootMsg(x.getCause)
    assert(rootMsg(plain).contains("AS SELECT"),
      s"the refusal names the CTAS door: ${rootMsg(plain)}")
    // a DECLARED stat column the query cannot satisfy refuses loudly
    // (a silent drop would mint an envelope-less table with no error)
    val typo = intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft_test.ctas.typo
          |TBLPROPERTIES ('statsCols' = 'dya')
          |AS SELECT id, id % 4 AS day FROM range(10)""".stripMargin)
    }
    assert(rootMsg(typo).contains("dya"),
      s"the refusal names the bad column: ${rootMsg(typo)}")
    assert(SnapshotTable.currentVersion(spark, s"$wh/ctas/typo") == 0L)
  }

  test("REPLACE TABLE AS SELECT commits against the observed base; history and envelopes survive") {
    ensureCatalog()
    spark.sql(
      """CREATE TABLE graft_test.ctas.rt
        |TBLPROPERTIES ('statsCols' = 'k')
        |AS SELECT id AS k, 'old' AS tag FROM range(0, 10)""".stripMargin)
    val t = s"$wh/ctas/rt"
    spark.sql(
      """REPLACE TABLE graft_test.ctas.rt
        |AS SELECT id AS k, 'new' AS tag FROM range(0, 5)""".stripMargin)
    assert(SnapshotTable.currentVersion(spark, t) == 2L)
    assert(spark.sql("SELECT count(*) FROM graft_test.ctas.rt")
      .head().getLong(0) == 5)
    assert(spark.table("graft_test.ctas.rt").select("tag")
      .distinct().head().getString(0) == "new")
    // the replaced version stays readable (time travel unchanged)
    assert(spark.sql(
      "SELECT count(*) FROM graft_test.ctas.rt VERSION AS OF 1")
      .head().getLong(0) == 10)
    assert(SnapshotTable.commitOp(spark, t).contains("replace"))
    // RTAS without the property carries the stat columns FORWARD
    assert(SnapshotTable.statsColsOf(spark, t) == Seq("k"),
      "an RTAS must not silently disable the table's file pruning")
    // REPLACE of a non-existent table refuses; CREATE OR REPLACE works
    // on both fresh and existing paths
    intercept[Exception] {
      spark.sql("REPLACE TABLE graft_test.ctas.nope AS SELECT 1 AS x")
    }
    spark.sql(
      "CREATE OR REPLACE TABLE graft_test.ctas.cor AS SELECT 1L AS x")
    assert(SnapshotTable.currentVersion(spark, s"$wh/ctas/cor") == 1L)
    spark.sql(
      "CREATE OR REPLACE TABLE graft_test.ctas.cor AS SELECT 2L AS x")
    assert(SnapshotTable.currentVersion(spark, s"$wh/ctas/cor") == 2L &&
      spark.table("graft_test.ctas.cor").head().getLong(0) == 2L)
  }

  test("concurrent CTAS race: exactly one wins the claim, the loser commits nothing") {
    ensureCatalog()
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      Either[Throwable, Unit]]()
    (1 to 2).foreach { i =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          results.add(
            try Right(spark.sql(
              s"""CREATE TABLE graft_test.ctas.race
                 |AS SELECT id, $i AS writer FROM range(0, 50)"""
                .stripMargin).collect() match { case _ => () })
            catch { case e: Throwable => Left(e) })
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    val (losers, winners) = results.asScala.toSeq.partition(_.isLeft)
    assert(winners.size == 1 && losers.size == 1,
      s"exactly one CTAS wins: $results")
    val t = s"$wh/ctas/race"
    assert(SnapshotTable.currentVersion(spark, t) == 1L,
      "the loser must not have minted a second version")
    // the surviving contents are ONE writer's, wholesale
    val ws = spark.table("graft_test.ctas.race")
      .select("writer").distinct().collect().map(_.getInt(0)).toSeq
    assert(ws.size == 1 && spark.table("graft_test.ctas.race").count() == 50)
  }

  test("a failing CTAS query leaves NOTHING: no table, no directory, no claim debris") {
    ensureCatalog()
    intercept[Exception] {
      spark.sql(
        """CREATE TABLE graft_test.ctas.boom AS
          |SELECT id, CASE WHEN id = 8 THEN raise_error('midwrite')
          |  ELSE 'ok' END AS tag
          |FROM range(0, 10)""".stripMargin).collect()
    }
    val t = s"$wh/ctas/boom"
    assert(SnapshotTable.currentVersion(spark, t) == 0L)
    val p = new org.apache.hadoop.fs.Path(t)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f.exists(p), "the aborted CREATE swept its empty directory")
    // and the identifier is immediately reusable
    spark.sql(
      "CREATE TABLE graft_test.ctas.boom AS SELECT 1L AS x")
    assert(spark.table("graft_test.ctas.boom").count() == 1)
  }

  test("DROP TABLE respects live consumer pins; PURGE overrides") {
    import spark.implicits._
    ensureCatalog()
    val t = s"$wh/pins/held"
    SnapshotTable.append(spark, t, Seq((1L, "x")).toDF("k", "v"))
    SnapshotTable.pinVersion(spark, t, "ckpt://live-consumer", 1L)
    val e = intercept[Exception] {
      spark.sql("DROP TABLE graft_test.pins.held")
    }
    assert(e.getMessage.contains("pin") &&
      e.getMessage.contains("live-consumer") &&
      e.getMessage.contains("PURGE"),
      s"a DROP under a live pin must refuse naming the consumer: ${e.getMessage}")
    assert(SnapshotTable.currentVersion(spark, t) == 1L, "table untouched")
    spark.sql("DROP TABLE graft_test.pins.held PURGE")
    assert(SnapshotTable.currentVersion(spark, t) == 0L, "PURGE forces")
    // without pins a plain DROP works
    SnapshotTable.append(spark, s"$wh/pins/free", Seq((1L, "x")).toDF("k", "v"))
    spark.sql("DROP TABLE graft_test.pins.free")
    assert(SnapshotTable.currentVersion(spark, s"$wh/pins/free") == 0L)
  }

  test("namespace surface: SHOW/CREATE/DROP NAMESPACE over the warehouse tree") {
    import spark.implicits._
    ensureCatalog()
    SnapshotTable.commit(spark, s"$wh/nsdemo/t1", Seq((1L, "a")).toDF("k", "v"))
    val namespaces = spark.sql("SHOW NAMESPACES IN graft_test")
      .collect().map(_.getString(0)).toSet
    assert(namespaces.contains("nsdemo"), s"namespaces: $namespaces")
    spark.sql("CREATE NAMESPACE graft_test.fresh_ns")
    assert(spark.sql("SHOW NAMESPACES IN graft_test")
      .collect().map(_.getString(0)).toSet.contains("fresh_ns"))
    // create-if-absent semantics: a second CREATE refuses
    val e = intercept[Exception] {
      spark.sql("CREATE NAMESPACE graft_test.fresh_ns")
    }
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
    // SHOW TABLES inside a namespace lists only committed tables
    import spark.implicits._
    val listed = spark.sql("SHOW TABLES IN graft_test.nsdemo")
      .select("tableName").as[String].collect().toSet
    assert(listed == Set("t1"))
    // empty namespace drops plainly; non-empty needs CASCADE
    spark.sql("DROP NAMESPACE graft_test.fresh_ns")
    assert(!spark.sql("SHOW NAMESPACES IN graft_test")
      .collect().map(_.getString(0)).toSet.contains("fresh_ns"))
    val e2 = intercept[Exception] {
      spark.sql("DROP NAMESPACE graft_test.nsdemo")
    }
    assert(e2.getMessage.toLowerCase.contains("empty") ||
      e2.getMessage.toLowerCase.contains("cascade"), e2.getMessage)
    spark.sql("DROP NAMESPACE graft_test.nsdemo CASCADE")
    assert(SnapshotTable.currentVersion(spark, s"$wh/nsdemo/t1") == 0L,
      "CASCADE removed the namespace and its (unpinned) table")
  }

  test("DROP NAMESPACE CASCADE respects live pins in NESTED namespaces") {
    import spark.implicits._
    ensureCatalog()
    // the pinned table lives one namespace DEEPER than the drop target:
    // a cascade that only checked direct children would destroy its
    // replay window without refusal
    val t = s"$wh/deepns/inner/held"
    SnapshotTable.append(spark, t, Seq((1L, "x")).toDF("k", "v"))
    SnapshotTable.pinVersion(spark, t, "ckpt://nested-consumer", 1L)
    val e = intercept[Exception] {
      spark.sql("DROP NAMESPACE graft_test.deepns CASCADE")
    }
    assert(e.getMessage.contains("pin") && e.getMessage.contains("held"),
      s"nested pinned table must refuse the cascade: ${e.getMessage}")
    assert(SnapshotTable.currentVersion(spark, t) == 1L, "subtree untouched")
    SnapshotTable.unpin(spark, t, "ckpt://nested-consumer")
    spark.sql("DROP NAMESPACE graft_test.deepns CASCADE")
    assert(SnapshotTable.currentVersion(spark, t) == 0L)
  }
}
