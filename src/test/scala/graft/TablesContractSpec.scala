package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.functions._

/** The `Tables.events` surface contract: `ts` is ns-since-epoch BIGINT no
  * matter which physical type the driver's generator last wrote
  * (TIMESTAMP(NANOS) read as long, or TIMESTAMP(MICROS)/NTZ read as a
  * timestamp). Every ts-arithmetic operator (evt_*, as-of, interval,
  * SCD2, lag/lead) depends on this; a testdata regen that flips the type
  * broke all 13 of them in round 6, so the contract is pinned here
  * against the REAL testdata, not a fixture.
  */
class TablesContractSpec extends SparkSpec {

  test("events.ts is ns-long at the Tables surface against the live testdata") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == LongType,
      s"ts must normalize to BIGINT ns, got ${ev.schema("ts").dataType}")
    // ns-range sanity: epoch-2020s instants are ~1.6-2.2e18 ns. A µs or s
    // value smuggled through unconverted would be 3/9 orders off.
    val r = ev.agg(min("ts"), max("ts")).head
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo > 1_000_000_000_000_000_000L && hi < 4_000_000_000_000_000_000L,
      s"ts out of ns epoch range: [$lo, $hi]")
  }

  test("ts_utc agrees with ts under integer µs math") {
    val bad = Tables.eventsTs(spark, sf)
      .filter(expr("unix_micros(ts_utc) * 1000 != ts"))
      .count()
    assert(bad == 0, s"$bad rows where ts_utc drifts from ts")
  }

  test("every table still carries the columns the operators compile against") {
    // drift guard: the driver regenerates testdata between rounds (the
    // round-6 ts-type flip broke 13 keys) — fail HERE, by table, rather
    // than in 131 scattered key errors, when a regen renames or drops a
    // column the packs depend on
    val required = Map(
      "region"    -> Seq("r_regionkey", "r_name"),
      "nation"    -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer"  -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      "supplier"  -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      "part"      -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
      "orders"    -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"),
      "lineitem"  -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"),
      "events"    -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id", "embedding", "label"))
    val missing = required.flatMap { case (t, cols) =>
      val have = Tables.table(spark, sf, t).columns.toSet
      cols.filterNot(have).map(c => s"$t.$c")
    }
    assert(missing.isEmpty, s"testdata drift — missing columns: $missing")
  }

  test("fixture invariants two r15 plan equivalences rest on: no null user_id / lang") {
    // Two r15 rewrites are equivalent only under these data facts (both
    // checked by hand then; pinned here so a testdata regen cannot
    // silently diverge from the oracle):
    //  - evt_rolling_active replaced the observed-days join with
    //    filter(active_1d >= 1); a day observed ONLY by null-user_id
    //    events would be kept by the old shape and dropped by the new.
    //  - sample_balanced derives its class target from the
    //    isnotnull(lang)-filtered (lang, bucket) aggregate; the oracle's
    //    min(count per lang) would include a NULL-lang group.
    val nullUsers = Tables.events(spark, sf)
      .filter(col("user_id").isNull).count()
    assert(nullUsers == 0,
      s"$nullUsers events rows with null user_id — evt_rolling_active's " +
        "observed-days-from-the-aggregate rewrite no longer matches the oracle")
    val nullLangs = Tables.documents(spark, sf)
      .filter(col("lang").isNull).count()
    assert(nullLangs == 0,
      s"$nullLangs documents rows with null lang — sample_balanced's " +
        "shared-aggregate class target no longer matches the oracle")
  }

  test("normalizeEventsTs is identity on an already-long ts and exact on timestamps") {
    import spark.implicits._
    val longDf = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    assert(Tables.normalizeEventsTs(longDf).schema("ts").dataType == LongType)
    assert(Tables.normalizeEventsTs(longDf).head.getLong(1) == 1700000000123456789L)

    val tsDf = Seq((1L, java.time.LocalDateTime.ofEpochSecond(1700000000L, 123456000, java.time.ZoneOffset.UTC)))
      .toDF("event_id", "ts")
    assert(Set[Any](TimestampType, TimestampNTZType).contains(tsDf.schema("ts").dataType))
    val n = Tables.normalizeEventsTs(tsDf)
    assert(n.schema("ts").dataType == LongType)
    assert(n.head.getLong(1) == 1700000000123456000L)
  }
}
