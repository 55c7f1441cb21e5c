package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.marine.Channels
import graft.pipeline.Sketches
import graft.sources.Layout

class LayoutSpec extends SparkSpec {

  test("date-partitioned write prunes partitions for date-bounded queries") {
    val tmp = Files.createTempDirectory("part").toString + "/events"
    val events = Tables.eventsTs(spark, sf)
    Layout.writeDatePartitioned(events, "ts_utc", tmp)
    val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("p_date=")) > 1, s"expected day dirs: ${dirs.toSeq}")

    val back = Layout.readPartitioned(spark, tmp)
      .filter(col("p_date") === "2024-01-03")
    back.collect()
    val plan = back.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("p_date"),
      s"date filter must prune at planning time: ${plan.take(500)}")
    // and the result is exactly that day's events
    val expected = events.filter(to_date(col("ts_utc")) === "2024-01-03").count()
    assert(back.count() == expected)
  }

  test("bucketed tables join without an Exchange on the bucket key") {
    Layout.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", 4, "orders_b")
    Layout.writeBucketed(
      Tables.customer(spark, sf).select(col("c_custkey"), col("c_name")),
      "c_custkey", 4, "customer_b")
    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 0, s"bucketed join must not shuffle: ${plan.take(600)}")
  }

  test("Channels.resample downsamples to fixed-width buckets") {
    import spark.implicits._
    val aligned = Seq(
      (0.0, 1.0), (0.4, 2.0), (1.2, 3.0), (2.6, 5.0))
      .toDF("ts", "sog")
    val out = Channels.resample(aligned, 1.0, Seq("sog")).collect()
    assert(out.length == 3)
    assert(out(0).getDouble(1) == 1.5) // mean of bucket [0,1)
  }

  test("Channels.alignByKey carries forward within each boat only") {
    import spark.implicits._
    val long = Seq(
      ("a", 1.0, "sog", 5.0), ("a", 2.0, "hdg", 180.0),
      ("b", 1.5, "sog", 7.0))
      .toDF("boat", "ts", "channel", "value")
      .withColumnRenamed("boat", "boat_id")
    val aligned = Channels.alignByKey(long, "boat_id", Seq("sog", "hdg"))
    val a2 = aligned.filter(col("boat_id") === "a" && col("ts") === 2.0).head()
    assert(a2.getDouble(a2.fieldIndex("sog")) == 5.0, "a's sog carried to ts=2")
    val b = aligned.filter(col("boat_id") === "b").head()
    assert(b.isNullAt(b.fieldIndex("hdg")), "b never saw hdg — no cross-boat leak")
  }

  test("Sketches.approxQuantiles brackets the exact median") {
    val q = Sketches.approxQuantiles(
      Tables.events(spark, sf), "event_type", "value", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, m) =>
      assert(math.abs(q(k) - m) / math.max(math.abs(m), 1.0) < 0.1)
    }
  }
}
