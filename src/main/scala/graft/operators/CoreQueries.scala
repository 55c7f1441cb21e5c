package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** SURVEY.md §2.1 scans + §2.2 projection / filter / predicates.
  *
  * These all compile to a single pruned+pushed parquet scan with no
  * shuffle (except the count's 1-row partial agg) — the plan shape that
  * matters most at 100 TB, where scan bytes dominate. `.explain` shows
  * ReadSchema limited to referenced columns and PushedFilters for every
  * comparison below.
  */
object CoreQueries extends QueryPack {

  private def scanParquet(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).agg(count(lit(1)).as("n"))

  /** Reads 2 of lineitem's 11 columns — parquet column pruning. */
  private def scanProjectionPushdown(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_quantity"))

  /** Money math is emitted integer-scaled (×10^4 / ×10^6, cast BIGINT):
    * prices/discounts/tax are fixed-decimal, so the scaled true value is
    * integral and nearest-integer rounding is immune to the half-up vs
    * raw-double `.5`-boundary drift between engines (SURVEY.md §7.5.6).
    */
  private def projectExpr(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000)
          .cast("long").as("net_price_e4"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")) * 1000000)
          .cast("long").as("charged_e6"),
        (col("l_quantity") > lit(25.0)).as("is_bulk"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Compound predicate: AND/OR, BETWEEN, IN, LIKE, comparison. */
  private def filterPred(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(
        col("o_orderstatus").isin("F", "O") &&
        col("o_totalprice").between(50000.0, 200000.0) &&
        (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%")) &&
        col("o_custkey") >= 10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  /** Testdata has no natural nulls — synthesize via nullif, then exercise
    * IS NULL / coalesce / null-safe predicates on them.
    */
  private def filterNullHandling(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        expr("nullif(o_orderstatus, 'F')").as("status_or_null"),
        coalesce(expr("nullif(o_orderstatus, 'F')"), lit("was_F")).as("status_filled"),
        expr("nullif(o_orderstatus, 'F')").isNull.as("is_f"))
      .filter(col("o_orderkey") < 600)
      .orderBy(col("o_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_parquet"              -> (scanParquet _),
    "scan_projection_pushdown"  -> (scanProjectionPushdown _),
    "project_expr"              -> (projectExpr _),
    "filter_pred"               -> (filterPred _),
    "filter_null_handling"      -> (filterNullHandling _))

  val oracle: Map[String, String] = Map(
    "scan_parquet" -> "SELECT count(*) AS n FROM lineitem",
    "scan_projection_pushdown" ->
      """SELECT l_orderkey, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_quantity""".stripMargin,
    "project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT) AS net_price_e4,
        |  CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000) AS BIGINT) AS charged_e6,
        |  l_quantity > 25.0 AS is_bulk
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_pred" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'O')
        |  AND o_totalprice BETWEEN 50000.0 AND 200000.0
        |  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
        |  AND o_custkey >= 10
        |ORDER BY o_orderkey""".stripMargin,
    "filter_null_handling" ->
      """SELECT o_orderkey,
        |  nullif(o_orderstatus, 'F') AS status_or_null,
        |  coalesce(nullif(o_orderstatus, 'F'), 'was_F') AS status_filled,
        |  nullif(o_orderstatus, 'F') IS NULL AS is_f
        |FROM orders
        |WHERE o_orderkey < 600
        |ORDER BY o_orderkey""".stripMargin)
}
