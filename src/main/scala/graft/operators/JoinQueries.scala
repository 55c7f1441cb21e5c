package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** SURVEY.md §2.3 — joins.
  *
  * Scale posture: dimension joins (nation, region, customer-at-small-SF)
  * broadcast — no shuffle of the fact side; fact-fact joins shuffle on the
  * equi keys and rely on AQE for skew splitting. The theta join is kept
  * bounded on both sides because a BNLJ is quadratic no matter the engine.
  * The as-of join re-partitions ONCE by key and sorts within partitions —
  * the same shape a 1000-executor run wants (no per-row lookups, no
  * driver-side state).
  */
object JoinQueries extends QueryPack {

  private def joinInner(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** Same semantics as an equi join but with the 25-row nation dim pinned
    * broadcast — the plan must show BroadcastHashJoin, no Exchange on the
    * probe side.
    */
  private def joinBroadcast(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
      .orderBy(col("c_custkey"))

  /** events.user_id domain ⊂ custkey, so most customers have no events —
    * real null-extension on the right.
    */
  private def joinLeft(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.events(s, dir), col("c_custkey") === col("user_id"), "left")
      .select(col("c_custkey"), col("event_id"))
      .orderBy(asc("c_custkey"), asc_nulls_first("event_id"))

  /** Full outer over two overlapping-but-distinct customer slices so both
    * sides contribute unmatched rows deterministically.
    */
  private def joinFull(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val evens = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("even_key"), col("c_acctbal").as("even_bal"))
    val thirds = c.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("third_key"), col("c_acctbal").as("third_bal"))
    evens.join(thirds, col("even_key") === col("third_key"), "full")
      .select(
        coalesce(col("even_key"), col("third_key")).as("k"),
        col("even_key").isNotNull.as("in_even"),
        col("third_key").isNotNull.as("in_third"))
      .orderBy(col("k"))
  }

  /** Right outer — the mirror of `join_left`: the preserved side is the
    * build input, unmatched customers null-extend the event columns.
    */
  private def joinRight(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .join(Tables.customer(s, dir), col("user_id") === col("c_custkey"), "right")
      .select(col("c_custkey"), col("event_id"))
      .orderBy(asc("c_custkey"), asc_nulls_first("event_id"))

  private def joinSemi(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.events(s, dir), col("c_custkey") === col("user_id"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private def joinAnti(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.events(s, dir), col("c_custkey") === col("user_id"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private def joinCross(s: SparkSession, dir: String): DataFrame =
    Tables.region(s, dir).select(col("r_name"))
      .crossJoin(Tables.nation(s, dir).select(col("n_name")))
      .orderBy(col("r_name"), col("n_name"))

  /** Pure non-equi (value-band + id-order) join between two fixed event
    * slices → BroadcastNestedLoopJoin. Slices are bounded by absolute ids
    * so the quadratic term does not grow with SF.
    */
  private def joinThetaRange(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val a = e.filter(col("event_id") < 500)
      .select(col("event_id").as("a_id"), col("value").as("a_value"))
    val b = e.filter(col("event_id") >= 500 && col("event_id") < 1000)
      .select(col("event_id").as("b_id"), col("value").as("b_value"))
    a.join(b, col("a_value") < col("b_value") && col("b_value") - col("a_value") < lit(1.0))
      .select(col("a_id"), col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** One as-of query body shared by BOTH keys, parameterized over the
    * backward implementation — so the two "identical semantics" keys can
    * never drift apart structurally (a fix applied to one is applied to
    * both by construction). Semantics: each purchase → latest click with
    * click.ts <= purchase.ts by the same user (inner: purchases with no
    * prior click drop out); ties at equal ts resolve inclusively with a
    * max-id tiebreak, matching DuckDB's `ASOF JOIN ... ON p.ts >= c.ts`;
    * `ts` stays an exact ns BIGINT throughout so no truncation can skew
    * the comparison.
    */
  private def asofBody(s: SparkSession, dir: String,
                       backward: (DataFrame, DataFrame, Seq[String], String, String,
                         Seq[String]) => DataFrame): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
    backward(purchases, clicks, Seq("user_id"), "ts", "ts", Seq("click_id"))
      .filter(col("asof_ts").isNotNull)
      .select(
        col("p_id"),
        col("user_id"),
        col("asof_click_id").as("click_id"),
        expr("(ts - asof_ts) DIV 1000000000").as("gap_s"))
      .orderBy(col("p_id"))
  }

  /** The composed implementation (graft.operators.AsofJoin): Spark has
    * no native as-of join, so this is the distributed plan shape for one
    * — tag both streams, union (shuffle-free), ONE hash Exchange on
    * user_id, per-partition sort, and a running `last(click,
    * ignoreNulls)` carry-forward; O(n log n) per partition, no point
    * lookups, works identically on 1000 executors.
    */
  private def joinAsof(s: SparkSession, dir: String): DataFrame =
    asofBody(s, dir, AsofJoin.backward(_, _, _, _, _, _))

  /** The same as-of semantics through the OTHER implementation: the
    * native custom-operator ladder (LogicalPlan node → SparkStrategy →
    * single-pass AsofMergeJoinExec, one Exchange+Sort per side, O(1)
    * merge memory — graft.plans.AsofMergeJoin). Declaring it as its own
    * oracle key certifies the custom physical operator directly against
    * DuckDB's ASOF JOIN, not merely against the composed twin.
    */
  private def joinAsofNative(s: SparkSession, dir: String): DataFrame =
    asofBody(s, dir, graft.plans.AsofMergeJoin.backward(_, _, _, _, _, _))

  /** FORWARD as-of through the same native operator (r8): each purchase
    * → the EARLIEST click with click.ts >= purchase.ts by the same user
    * — the "next touch after" attribution direction (follow-up action,
    * next quote after a trade), previously spec-only (fwd = true in
    * AsofMergeJoinExec runs the merge over the time-reversed per-key
    * ordering, same one-Exchange+Sort-per-side plan). Declaring it as
    * its own oracle key certifies the forward merge path directly
    * against DuckDB's `ASOF JOIN ... ON p.ts <= c.ts` (probed r8:
    * forward inequality supported). ts stays exact ns BIGINT; ties are
    * physically absent in this corpus (ns timestamps).
    */
  private def joinAsofForwardNative(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
    graft.plans.AsofMergeJoin.forward(purchases, clicks, Seq("user_id"), "ts", "ts",
        Seq("click_id"))
      .filter(col("asof_ts").isNotNull)
      .select(
        col("p_id"),
        col("user_id"),
        col("asof_click_id").as("click_id"),
        expr("(asof_ts - ts) DIV 1000000000").as("gap_s"))
      .orderBy(col("p_id"))
  }

  /** TOLERANCE as-of (pandas merge_asof `tolerance`, the common
    * production form: sensor alignment with a max staleness bound) —
    * the last spec-only member of the as-of family, now oracle-certified
    * (round-9): each purchase keeps ALL rows (left semantics) and its
    * latest-prior-click attribution is NULLED when the gap exceeds one
    * day of event time. For the backward direction the bound needs no
    * second search: the latest prior click is the NEAREST prior, so if
    * it is out of tolerance every prior click is — [[AsofJoin.within]]
    * is exactly "latest prior click within the bound", which the DuckDB
    * correlated-max oracle states directly. ts stays exact ns BIGINT;
    * the overflow-clamped window arithmetic is exercised by the spec,
    * the corpus certifies the in/out/null three-way split (probed: ~1/3
    * of purchases in tolerance, most out, some unmatched, at all 3 SFs).
    */
  private def joinAsofWithin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("p_id"))
    val joined = AsofJoin.backward(purchases, clicks, Seq("user_id"), "ts", "ts",
      Seq("click_id"))
    AsofJoin.within(joined, "ts", 86400L * 1000000000L)
      .select(
        col("p_id"),
        col("user_id"),
        col("asof_click_id").as("click_id"),
        expr("(ts - asof_ts) DIV 1000000000").as("gap_s"))
      .orderBy(col("p_id"))
  }

  /** The band join through the OPTIMIZER RULE (graft.plans.BandJoinRewrite,
    * registered imperatively like the asof strategy): a pure
    * `abs(a − b) <= c` inner join over integer value-cents, which stock
    * Spark plans as a nested loop. The rule rewrites it to a bucketed
    * equi-join (3-bucket probe explode), turning O(|A|·|B|) compares
    * into a hash join — the same certify-the-custom-operator-directly
    * pattern as join_asof_native: DuckDB answers the plain inequality
    * join, our engine answers through the rewritten plan, and the hash
    * compare certifies the rewrite end-to-end (the secondary a_id<b_id
    * conjunct rides as a post-filter and must survive untouched).
    */
  def bandNativeCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    if (!s.experimental.extraOptimizations.contains(graft.plans.BandJoinRewrite))
      s.experimental.extraOptimizations =
        graft.plans.BandJoinRewrite +: s.experimental.extraOptimizations
    val a = events.filter(col("event_type") === "click")
      .select(col("event_id").as("a_id"),
        round(col("value") * 100).cast("long").as("a_c"))
    val b = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("b_id"),
        round(col("value") * 100).cast("long").as("b_c"))
    a.join(b, abs(col("a_c") - col("b_c")) <= 10 && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), (col("a_c") - col("b_c")).as("delta_c"))
  }

  private def joinBandNative(s: SparkSession, dir: String): DataFrame =
    bandNativeCore(Tables.events(s, dir)).orderBy(col("a_id"), col("b_id"))

  /** Point-in-interval range join through the OPTIMIZER RULE
    * (graft.plans.IntervalJoinRewrite): every purchase opens a 600 s
    * attribution window [ts, ts+600]; count and sum (exact value-cents)
    * the clicks landing in ANY window — deliberately no user equality,
    * the shape stock Spark can only nested-loop. The rule buckets the
    * click at floorDiv(sec, w) once and explodes the window to its
    * covered buckets, so the join is a hash equi-join; DuckDB answers
    * the plain inequality join and the hash compare certifies the
    * rewrite end-to-end (the join_band_native pattern). Width = the
    * window length: ≤2 probe rows per interval, the optimum for
    * fixed-length windows.
    */
  def intervalNativeCore(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    if (!s.experimental.extraOptimizations.contains(graft.plans.IntervalJoinRewrite))
      s.experimental.extraOptimizations =
        graft.plans.IntervalJoinRewrite +: s.experimental.extraOptimizations
    s.conf.set(graft.plans.IntervalJoinRewrite.widthKey, "600")
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"),
        expr("ts DIV 1000000000").as("lo"),
        (expr("ts DIV 1000000000") + 600L).as("hi"))
    val c = events.filter(col("event_type") === "click")
      .select(expr("ts DIV 1000000000").as("pt"),
        round(col("value") * 100).cast("long").as("c_cents"))
    c.join(p, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .groupBy(col("p_id"))
      .agg(count(lit(1)).as("n_clicks"), sum(col("c_cents")).as("click_cents"))
  }

  private def joinIntervalNative(s: SparkSession, dir: String): DataFrame =
    intervalNativeCore(Tables.events(s, dir)).orderBy(col("p_id"))

  /** SKEW-SALTED join, hash-certified: every event joins its per-type
    * stats row, but `event_type` has 5 values — the canonical hot-key
    * join where a plain shuffle lands the whole corpus on 5 reducers no
    * matter how wide the cluster. `Skew.saltedJoin` spreads each hot key
    * over 16 deterministic salt buckets (fact salts by hash(event_id),
    * the dim replicates 16×), so reduce-side parallelism is
    * |types|·buckets instead of |types|. The oracle states the PLAIN
    * join; the hash compare certifies the salted decomposition
    * row-for-row — the same discipline as the bucketed global
    * rank/prefix-sum keys, applied to the shuffle-skew tool.
    */
  def skewSaltedCore(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("v_c"))
    val dim = ev.groupBy(col("event_type").as("d_type"))
      .agg(count(lit(1)).as("type_n"), sum(col("v_c")).as("type_sum_c"))
      .withColumnRenamed("d_type", "event_type")
    graft.pipeline.Skew.saltedJoin(ev, dim, "event_type",
        col("event_id"), buckets = 16)
      .select(col("event_id"), col("event_type"), col("v_c"),
        col("type_n"), col("type_sum_c"))
  }

  private def joinSkewSalted(s: SparkSession, dir: String): DataFrame =
    skewSaltedCore(Tables.events(s, dir)).orderBy(col("event_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_skew_salted" -> (joinSkewSalted _),
    "join_band_native" -> (joinBandNative _),
    "join_interval_native" -> (joinIntervalNative _),
    "join_asof_native" -> (joinAsofNative _),
    "join_asof_forward_native" -> (joinAsofForwardNative _),
    "join_inner"       -> (joinInner _),
    "join_broadcast"   -> (joinBroadcast _),
    "join_left"        -> (joinLeft _),
    "join_full"        -> (joinFull _),
    "join_right"       -> (joinRight _),
    "join_semi"        -> (joinSemi _),
    "join_anti"        -> (joinAnti _),
    "join_cross"       -> (joinCross _),
    "join_theta_range" -> (joinThetaRange _),
    "join_asof"        -> (joinAsof _),
    "join_asof_within" -> (joinAsofWithin _))

  val oracle: Map[String, String] = Map(
    // PORTABLE: the plain-join statement of the salted decomposition
    "join_skew_salted" ->
      """WITH ev AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |d AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS type_n,
        |    CAST(sum(v_c) AS BIGINT) AS type_sum_c
        |  FROM ev GROUP BY event_type)
        |SELECT ev.event_id, ev.event_type, ev.v_c, d.type_n, d.type_sum_c
        |FROM ev JOIN d ON ev.event_type = d.event_type
        |ORDER BY ev.event_id""".stripMargin,
    "join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_broadcast" ->
      """SELECT c_custkey, n_name
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,
    "join_left" ->
      """SELECT c_custkey, event_id
        |FROM customer LEFT JOIN events ON c_custkey = user_id
        |ORDER BY c_custkey ASC, event_id ASC NULLS FIRST""".stripMargin,
    "join_full" ->
      """SELECT coalesce(e.even_key, t.third_key) AS k,
        |  e.even_key IS NOT NULL AS in_even,
        |  t.third_key IS NOT NULL AS in_third
        |FROM (SELECT c_custkey AS even_key, c_acctbal AS even_bal FROM customer WHERE c_custkey % 2 = 0) e
        |FULL JOIN (SELECT c_custkey AS third_key, c_acctbal AS third_bal FROM customer WHERE c_custkey % 3 = 0) t
        |  ON e.even_key = t.third_key
        |ORDER BY k""".stripMargin,
    "join_right" ->
      """SELECT c_custkey, event_id
        |FROM events RIGHT JOIN customer ON user_id = c_custkey
        |ORDER BY c_custkey ASC, event_id ASC NULLS FIRST""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "join_theta_range" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM (SELECT * FROM events WHERE event_id < 500) a
        |JOIN (SELECT * FROM events WHERE event_id >= 500 AND event_id < 1000) b
        |  ON a.value < b.value AND b.value - a.value < 1.0
        |ORDER BY a_id, b_id""".stripMargin,
    "join_band_native" ->
      """WITH a AS (
        |  SELECT event_id AS a_id, CAST(round(value * 100) AS BIGINT) AS a_c
        |  FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT event_id AS b_id, CAST(round(value * 100) AS BIGINT) AS b_c
        |  FROM events WHERE event_type = 'purchase')
        |SELECT a_id, b_id, a_c - b_c AS delta_c
        |FROM a JOIN b ON abs(a_c - b_c) <= 10 AND a_id < b_id
        |ORDER BY a_id, b_id""".stripMargin,
    "join_interval_native" ->
      """WITH p AS (
        |  SELECT event_id AS p_id,
        |         epoch_ns(ts) // 1000000000 AS lo,
        |         epoch_ns(ts) // 1000000000 + 600 AS hi
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT epoch_ns(ts) // 1000000000 AS pt,
        |         CAST(round(value * 100) AS BIGINT) AS c_cents
        |  FROM events WHERE event_type = 'click')
        |SELECT p_id, count(*) AS n_clicks, CAST(sum(c_cents) AS BIGINT) AS click_cents
        |FROM c JOIN p ON pt >= lo AND pt <= hi
        |GROUP BY p_id
        |ORDER BY p_id""".stripMargin,
    "join_asof" -> asofOracleSql,
    // identical oracle text on purpose (shared val): the two keys are
    // two implementations (composed window vs native merge operator) of
    // ONE declared semantics, certified against the same DuckDB answer
    "join_asof_native" -> asofOracleSql,
    "join_asof_forward_native" ->
      """SELECT p.event_id AS p_id, p.user_id, c.event_id AS click_id,
        |  (epoch_ns(c.ts) - epoch_ns(p.ts)) // 1000000000 AS gap_s
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p_id""".stripMargin,
    // correlated-max oracle (DuckDB's ASOF JOIN has no tolerance): for
    // the backward direction "latest prior within the bound" IS the
    // tolerance-filtered latest prior, so the bound rides inside the
    // max subquery; the LEFT join keeps unattributed purchases as nulls
    "join_asof_within" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, epoch_ns(ts) AS tns
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS tns
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p_id, user_id, tns,
        |    (SELECT max(c.tns) FROM c
        |     WHERE c.user_id = p.user_id AND c.tns <= p.tns
        |       AND p.tns - c.tns <= 86400000000000) AS c_tns
        |  FROM p)
        |SELECT m.p_id, m.user_id, c.event_id AS click_id,
        |  (m.tns - m.c_tns) // 1000000000 AS gap_s
        |FROM m LEFT JOIN c ON c.user_id = m.user_id AND c.tns = m.c_tns
        |ORDER BY p_id""".stripMargin)

  private lazy val asofOracleSql =
    """SELECT p.event_id AS p_id, p.user_id, c.event_id AS click_id,
      |  (epoch_ns(p.ts) - epoch_ns(c.ts)) // 1000000000 AS gap_s
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p_id""".stripMargin
}
