package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.sources.SnapshotTable

/** SQL `MERGE INTO` through the extension rule: full clause semantics
  * (ordered WHEN clauses, partial updates, inserts, NOT MATCHED BY
  * SOURCE) over a catalog-loaded snapshot table, committed through the
  * claim protocol — plus the loud refusals for the shapes the
  * translation deliberately excludes.
  */
class GraftSqlMergeSpec extends SparkSpec {

  private lazy val wh = Files.createTempDirectory("graft-wh-merge").toString

  /** A second session over the shared context with the extension and
    * the catalog registered (analyzer rules inject only at build).
    */
  private def withMergeSession[A](body: SparkSession => A): A = {
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new graft.sources.GraftSnapshotExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s2.conf.set("spark.sql.catalog.graft_m", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft_m.warehouse", wh)
    try body(s2)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  private def stateOf(s: SparkSession, t: String): Set[(Option[Long], String)] =
    SnapshotTable.read(s, t).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        r.getString(1))).toSet

  test("MERGE upsert: partial UPDATE + INSERT *, committed through the claim protocol") {
    withMergeSession { s2 =>
      import s2.implicits._
      val t = s"$wh/m/upsert"
      SnapshotTable.commit(s2, t,
        (0L until 6L).map(i => (i, s"old$i", i * 10L)).toDF("k", "tag", "v"),
        statsCols = Seq("k"))
      Seq((4L, "up4", 400L), (5L, "up5", 500L), (9L, "new9", 900L))
        .toDF("k", "tag", "v").createOrReplaceTempView("src")
      s2.sql(
        """MERGE INTO graft_m.m.upsert t USING src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET tag = s.tag
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val got = SnapshotTable.read(s2, t).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      // partial update: v keeps its TARGET value on matched rows
      assert(got == Set(
        (0L, "old0", 0L), (1L, "old1", 10L), (2L, "old2", 20L),
        (3L, "old3", 30L), (4L, "up4", 40L), (5L, "up5", 50L),
        (9L, "new9", 900L)), s"got: $got")
      assert(SnapshotTable.currentVersion(s2, t) == 2L &&
        SnapshotTable.commitOp(s2, t).contains("merge"))
      assert(SnapshotTable.statsColsOf(s2, t) == Seq("k"),
        "the MERGE commit carries the stat columns forward")
    }
  }

  test("ordered clauses: conditional DELETE before UPDATE; NOT MATCHED BY SOURCE; null keys never match") {
    withMergeSession { s2 =>
      import s2.implicits._
      val t = s"$wh/m/clauses"
      SnapshotTable.commit(s2, t,
        ((0L until 4L).map(i => (Some(i), s"old$i"))
          :+ ((None: Option[Long]), "tnull")).toDF("k", "tag"))
      (Seq((Some(1L), "up1", false), (Some(2L), "x", true),
        (Some(7L), "new7", false), (None: Option[Long], "snull", false))
        .toDF("k", "tag", "del")).createOrReplaceTempView("src")
      s2.sql(
        """MERGE INTO graft_m.m.clauses t USING src s ON t.k = s.k
          |WHEN MATCHED AND s.del THEN DELETE
          |WHEN MATCHED THEN UPDATE SET tag = s.tag
          |WHEN NOT MATCHED THEN INSERT (k, tag) VALUES (s.k, s.tag)
          |WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN UPDATE SET tag = 'stale'
          |""".stripMargin)
      assert(stateOf(s2, t) == Set(
        (Some(0L), "old0"),          // untouched (no source row, k != 3)
        (Some(1L), "up1"),           // matched, del=false → second clause
        // k=2 deleted by the FIRST applicable clause
        (Some(3L), "stale"),         // not matched by source, cond hit
        (Some(7L), "new7"),          // unmatched source → insert
        (None, "tnull"),             // null target key: not matched by
                                     // source, cond (k=3) null → kept
        (None, "snull")),            // null source key: never matches →
                                     // insert
        s"state: ${stateOf(s2, t)}")
    }
  }

  test("UPDATE-only and DELETE-only merges leave unmatched rows alone") {
    withMergeSession { s2 =>
      import s2.implicits._
      val t = s"$wh/m/updonly"
      SnapshotTable.commit(s2, t,
        (0L until 4L).map(i => (i, s"o$i")).toDF("k", "tag"))
      Seq((2L, "u2"), (9L, "ghost")).toDF("k", "tag")
        .createOrReplaceTempView("src")
      // no NOT MATCHED clause: the unmatched source row must NOT insert
      s2.sql(
        """MERGE INTO graft_m.m.updonly t USING src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
      assert(stateOf(s2, t).map { case (k, v) => (k.get, v) } ==
        Set((0L, "o0"), (1L, "o1"), (2L, "u2"), (3L, "o3")))
      s2.sql(
        """MERGE INTO graft_m.m.updonly t USING src s ON t.k = s.k
          |WHEN MATCHED THEN DELETE""".stripMargin)
      assert(stateOf(s2, t).map { case (k, v) => (k.get, v) } ==
        Set((0L, "o0"), (1L, "o1"), (3L, "o3")),
        "DELETE-only: matched rows die, ghost source row is a no-op")
    }
  }

  test("duplicate source keys refuse loudly (the one-change-row-per-key discipline)") {
    withMergeSession { s2 =>
      import s2.implicits._
      val t = s"$wh/m/cardinality"
      SnapshotTable.commit(s2, t, Seq((1L, "x")).toDF("k", "tag"))
      Seq((1L, "a"), (1L, "b")).toDF("k", "tag")
        .createOrReplaceTempView("src")
      val e = intercept[Exception] {
        s2.sql(
          """MERGE INTO graft_m.m.cardinality t USING src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
      }
      def rootMsg(x: Throwable): String =
        if (x.getCause == null) x.getMessage
        else x.getMessage + "\n" + rootMsg(x.getCause)
      assert(rootMsg(e).contains("more than one source row"),
        s"cardinality refusal: ${rootMsg(e)}")
      assert(SnapshotTable.currentVersion(s2, t) == 1L,
        "a refused merge commits nothing")
    }
  }

  test("SQL UPDATE: assignments under the condition, NULL never updates, stats carried") {
    withMergeSession { s2 =>
      import s2.implicits._
      val t = s"$wh/m/update"
      SnapshotTable.commit(s2, t,
        (Seq((Some(0L), "a", 1L), (Some(1L), "b", 2L), (Some(2L), "c", 3L),
          ((None: Option[Long]), "n", 4L))).toDF("k", "tag", "v"),
        statsCols = Seq("v"))
      // expression assignment referencing the row's own columns; the
      // NULL-k row's condition evaluates NULL → not updated
      s2.sql(
        """UPDATE graft_m.m.update SET tag = concat(tag, '!'), v = v * 10
          |WHERE k >= 1""".stripMargin)
      val got = SnapshotTable.read(s2, t).collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          r.getString(1), r.getLong(2))).toSet
      assert(got == Set(
        (Some(0L), "a", 1L), (Some(1L), "b!", 20L), (Some(2L), "c!", 30L),
        (None, "n", 4L)), s"got: $got")
      assert(SnapshotTable.commitOp(s2, t).contains("update") &&
        SnapshotTable.statsColsOf(s2, t) == Seq("v"),
        "op stamped; stat columns carried forward")
      // unconditional UPDATE touches every row
      s2.sql("UPDATE graft_m.m.update SET v = 0")
      assert(SnapshotTable.read(s2, t).select("v")
        .as[Long].collect().forall(_ == 0L))
      // a condition matching nothing still commits a version (SQL
      // UPDATE semantics: zero rows affected is a success)
      s2.sql("UPDATE graft_m.m.update SET v = 9 WHERE k = 999")
      assert(SnapshotTable.read(s2, t).select("v")
        .as[Long].collect().forall(_ == 0L))
    }
  }

  test("refusals: non-equi conditions, self-merge, and path-door targets name the Scala doors") {
    withMergeSession { s2 =>
      import s2.implicits._
      val t = s"$wh/m/refuse"
      SnapshotTable.commit(s2, t, Seq((1L, "x", 5L)).toDF("k", "tag", "v"))
      Seq((1L, "a", 7L)).toDF("k", "tag", "v").createOrReplaceTempView("src")
      def rootMsg(x: Throwable): String =
        if (x.getCause == null) x.getMessage
        else x.getMessage + "\n" + rootMsg(x.getCause)
      // non-equi conjunct
      val e1 = intercept[Exception] {
        s2.sql(
          """MERGE INTO graft_m.m.refuse t USING src s
            |ON t.k = s.k AND t.v < s.v
            |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
      }
      assert(rootMsg(e1).contains("equi") &&
        rootMsg(e1).contains("WHEN clause"),
        s"non-equi refusal points at clause conditions: ${rootMsg(e1)}")
      // the equivalent WHEN-clause residual WORKS
      s2.sql(
        """MERGE INTO graft_m.m.refuse t USING src s ON t.k = s.k
          |WHEN MATCHED AND t.v < s.v THEN UPDATE SET tag = s.tag"""
          .stripMargin)
      assert(SnapshotTable.read(s2, t).collect()
        .map(_.getString(1)).toSeq == Seq("a"))
      // self-merge
      val e2 = intercept[Exception] {
        s2.sql(
          """MERGE INTO graft_m.m.refuse t
            |USING graft_m.m.refuse s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
      }
      assert(rootMsg(e2).contains("target table itself"),
        s"self-merge refusal: ${rootMsg(e2)}")
      // self-merge through the PATH door (a temp view over the format
      // load) is the same physical table — identity is by root
      s2.read.format("graft-snapshot").load(s"$wh/m/refuse")
        .createOrReplaceTempView("self_path")
      val e3 = intercept[Exception] {
        s2.sql(
          """MERGE INTO graft_m.m.refuse t USING self_path s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
      }
      assert(rootMsg(e3).contains("target table itself"),
        s"path-door self-merge refusal: ${rootMsg(e3)}")
    }
  }

  test("several NULL-keyed source rows are independent inserts, not a cardinality violation") {
    withMergeSession { s2 =>
      import s2.implicits._
      val t = s"$wh/m/nullins"
      SnapshotTable.commit(s2, t, Seq((Some(1L), "x")).toDF("k", "tag"))
      Seq((None: Option[Long], "n1"), (None: Option[Long], "n2"),
        (Some(1L), "up")).toDF("k", "tag").createOrReplaceTempView("src")
      s2.sql(
        """MERGE INTO graft_m.m.nullins t USING src s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET tag = s.tag
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(stateOf(s2, t) ==
        Set((Some(1L), "up"), (None, "n1"), (None, "n2")),
        "null keys never match: both null rows insert, the guard is " +
          s"non-null-only — ${stateOf(s2, t)}")
    }
  }
}
