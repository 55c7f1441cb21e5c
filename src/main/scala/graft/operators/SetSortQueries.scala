package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** SURVEY.md §2.6 — sort / limit / top-k / set operations.
  *
  * Scale notes: `limit_topk` must plan as TakeOrderedAndProject (per-
  * partition heap + driver merge of k rows), never a global sort — at
  * 100 TB a full sort for LIMIT 100 is the classic accidental O(n log n)
  * shuffle. Set ops are hash-partitioned by all columns; `union ALL` is
  * shuffle-free.
  */
object SetSortQueries extends QueryPack {

  /** Multi-key sort with explicit null ordering; nulls synthesized via
    * nullif since testdata has none.
    */
  private def sortMulti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(
        col("c_custkey"),
        expr("nullif(c_mktsegment, 'BUILDING')").as("seg"),
        col("c_acctbal"))
      .orderBy(asc_nulls_first("seg"), desc("c_acctbal"), asc("c_custkey"))

  /** Global ORDER BY + LIMIT → TakeOrderedAndProject physical op. */
  private def limitTopk(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      .limit(100)

  /** ORDER BY + OFFSET + LIMIT pagination: rows 101–150 of the price
    * ranking. Spark still bounds the sort by limit+offset (top-150 per
    * partition, driver drops 100) — no full global sort.
    */
  private def limitOffset(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      .offset(100)
      .limit(50)

  private def clicks(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "click")
  private def views(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(col("event_type") === "view")

  private def setUnionAll(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir).select(col("event_id"), col("event_type"), col("user_id"))
      .unionByName(
        views(s, dir).select(col("event_id"), col("event_type"), col("user_id")))
      .orderBy(col("event_id"))

  private def setUnionDistinct(s: SparkSession, dir: String): DataFrame =
    clicks(s, dir).select(col("user_id"))
      .union(views(s, dir).select(col("user_id")))
      .distinct()
      .orderBy(col("user_id"))

  /** Customer keys that also appear as event users. */
  private def setIntersect(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("k"))
      .intersect(Tables.events(s, dir).select(col("user_id").as("k")))
      .orderBy(col("k"))

  /** Customer keys that never appear as event users (events' user_id
    * domain is a strict subset of custkey, so this is non-empty).
    */
  private def setExcept(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("k"))
      .except(Tables.events(s, dir).select(col("user_id").as("k")))
      .orderBy(col("k"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_multi"         -> (sortMulti _),
    "limit_topk"         -> (limitTopk _),
    "limit_offset"       -> (limitOffset _),
    "set_union_all"      -> (setUnionAll _),
    "set_union_distinct" -> (setUnionDistinct _),
    "set_intersect"      -> (setIntersect _),
    "set_except"         -> (setExcept _))

  val oracle: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
        |FROM customer
        |ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC""".stripMargin,
    "limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,
    "limit_offset" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 50 OFFSET 100""".stripMargin,
    "set_union_all" ->
      """SELECT event_id, event_type, user_id FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, event_type, user_id FROM events WHERE event_type = 'view'
        |ORDER BY event_id""".stripMargin,
    "set_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'view'
        |ORDER BY user_id""".stripMargin,
    "set_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT
        |SELECT user_id AS k FROM events
        |ORDER BY k""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT
        |SELECT user_id AS k FROM events
        |ORDER BY k""".stripMargin)
}
