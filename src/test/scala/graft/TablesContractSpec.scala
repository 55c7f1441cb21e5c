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
