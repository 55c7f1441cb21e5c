package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryPack, Tables}

/** Scalar-subquery surface (SURVEY.md §4 "subquery decorrelation"):
  * the one optimizer capability the join packs exercised only in
  * EXISTS/anti form. These run through `spark.sql` over temp views —
  * the SQL front-end Spark provides for free — so Catalyst's
  * RewriteCorrelatedScalarSubquery turns the correlated aggregate into
  * a join + group-by instead of a per-row lookup (per-row subquery
  * evaluation is the shape that cannot scale).
  *
  * Determinism (§7.5): both queries compare and emit integer cents
  * (`round(price*100)::BIGINT`), so the correlated threshold
  * `p > 1.5 * avg(p)` is evaluated as the exact integer cross-product
  * `p_c * n * 10 > 15 * sum_c` — bit-identical in any engine, no float
  * aggregate ever crosses the comparison.
  */
object SubqueryQueries extends QueryPack {

  private def view(s: SparkSession, dir: String): Unit =
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")

  /** Orders priced above 1.5× their customer's average order value. */
  private def subqScalarCorr(s: SparkSession, dir: String): DataFrame = {
    view(s, dir)
    s.sql("""
      SELECT o_orderkey, o_custkey,
        CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      FROM orders_v o
      WHERE CAST(round(o_totalprice * 100) AS BIGINT)
              * (SELECT count(*) FROM orders_v o2
                 WHERE o2.o_custkey = o.o_custkey) * 10
            > 15 * (SELECT sum(CAST(round(o3.o_totalprice * 100) AS BIGINT))
                    FROM orders_v o3 WHERE o3.o_custkey = o.o_custkey)
      ORDER BY o_orderkey""")
  }

  /** Each order's price as basis points of the global average — an
    * uncorrelated scalar subquery evaluated once and broadcast.
    */
  private def subqScalarUncorr(s: SparkSession, dir: String): DataFrame = {
    view(s, dir)
    s.sql("""
      SELECT o_orderkey,
        CAST(round(o_totalprice * 100) AS BIGINT)
          * (SELECT count(*) FROM orders_v) * 10000
          DIV (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT)) FROM orders_v)
          AS ratio_bp
      FROM orders_v
      ORDER BY o_orderkey""")
  }

  /** LATERAL correlated subquery: top-2 customers per nation by balance.
    * Catalyst decorrelates the per-nation ORDER BY … LIMIT 2 into a
    * ranked window join (DecorrelateInnerQuery) — the per-row-subquery
    * shape that cannot scale never reaches the physical plan.
    */
  private def subqLateral(s: SparkSession, dir: String): DataFrame = {
    Tables.nation(s, dir).createOrReplaceTempView("nation_sq")
    Tables.customer(s, dir).createOrReplaceTempView("customer_sq")
    s.sql("""
      SELECT n.n_name, t.c_custkey, t.bal_c
      FROM nation_sq n,
      LATERAL (
        SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        FROM customer_sq c WHERE c.c_nationkey = n.n_nationkey
        ORDER BY bal_c DESC, c_custkey LIMIT 2) t
      ORDER BY n.n_name, t.bal_c DESC, t.c_custkey""")
  }

  /** Null-aware membership. The WHERE NOT IN has a nullable probe side
    * (null probe → row filtered) — Spark plans it as a null-aware anti
    * join, and both engines implement its three-valued logic
    * identically. The PROJECTED membership is different: its IN list
    * contains a null, where SQL 3VL yields TRUE or NULL (never FALSE),
    * but Spark lowers a projected IN-subquery to a two-valued
    * ExistenceJoin that emits FALSE instead of NULL — so both sides
    * canonicalize with `coalesce(…, false)`, which is also the form a
    * user would actually want for a boolean feature column.
    */
  private def subqMembership(s: SparkSession, dir: String): DataFrame = {
    Tables.nation(s, dir).createOrReplaceTempView("nation_sq")
    Tables.customer(s, dir).createOrReplaceTempView("customer_sq")
    s.sql("""
      SELECT c_custkey, c_nationkey,
        coalesce(c_nationkey IN (SELECT nullif(n_nationkey, 6)
                                 FROM nation_sq WHERE n_regionkey = 1),
                 false) AS in_r1
      FROM customer_sq
      WHERE nullif(c_nationkey, 7) NOT IN
        (SELECT n_nationkey FROM nation_sq WHERE n_regionkey = 2)
      ORDER BY c_custkey""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "subq_scalar_corr"   -> (subqScalarCorr _),
    "subq_scalar_uncorr" -> (subqScalarUncorr _),
    "subq_lateral"       -> (subqLateral _),
    "subq_membership"    -> (subqMembership _))

  val oracle: Map[String, String] = Map(
    "subq_lateral" ->
      """SELECT n.n_name, t.c_custkey, t.bal_c
        |FROM nation n,
        |LATERAL (
        |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer c WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY bal_c DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.bal_c DESC, t.c_custkey""".stripMargin,
    "subq_membership" ->
      """SELECT c_custkey, c_nationkey,
        |  coalesce(c_nationkey IN (SELECT nullif(n_nationkey, 6)
        |                           FROM nation WHERE n_regionkey = 1),
        |           false) AS in_r1
        |FROM customer
        |WHERE nullif(c_nationkey, 7) NOT IN
        |  (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |ORDER BY c_custkey""".stripMargin,
    "subq_scalar_corr" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        |FROM orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT)
        |        * (SELECT count(*) FROM orders o2
        |           WHERE o2.o_custkey = o.o_custkey) * 10
        |      > 15 * (SELECT sum(CAST(round(o3.o_totalprice * 100) AS BIGINT))
        |              FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "subq_scalar_uncorr" ->
      """SELECT o_orderkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT)
        |    * (SELECT count(*) FROM orders) * 10000
        |    // (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) FROM orders)
        |    AS ratio_bp
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin)
}
