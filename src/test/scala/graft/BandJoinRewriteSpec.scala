package graft

import org.apache.spark.sql.functions._
import graft.plans.BandJoinRewrite

/** BandJoinRewrite: a pure |l.ts − r.ts| <= c inner join must produce
  * identical rows with and without the rule, and with the rule the plan
  * must be an equi-join rather than a nested loop.
  */
class BandJoinRewriteSpec extends SparkSpec {

  private var saved: Seq[org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] = Nil

  override def beforeAll(): Unit = {
    super.beforeAll()
    saved = spark.experimental.extraOptimizations
  }

  // shared singleton session — never leak the rewrite into other suites
  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations = saved
    super.afterAll()
  }

  private def bandJoin() = {
    val e = Tables.events(spark, sf).select(col("ts"), col("event_id"))
    val band = 600L * 1000000000L // 10 min in ns
    e.select(col("ts").as("ta"), col("event_id").as("a_id"))
      .join(e.select(col("ts").as("tb"), col("event_id").as("b_id")),
        abs(col("ta") - col("tb")) <= band && col("a_id") < col("b_id"))
      .select("a_id", "b_id")
  }

  test("rewrite preserves the exact pair set of the nested-loop plan") {
    spark.experimental.extraOptimizations = saved
    val expected = bandJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce in-band pairs")

    spark.experimental.extraOptimizations = saved :+ BandJoinRewrite
    try {
      val got = bandJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"rewritten join changed results: got ${got.size}, want ${expected.size}")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rewrite turns the nested loop into an equi-join on the band bucket") {
    spark.experimental.extraOptimizations = saved :+ BandJoinRewrite
    try {
      val plan = bandJoin().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"band join must not nested-loop: ${plan.take(500)}")
      assert(plan.contains("__band_bucket"), s"bucket key expected in plan: ${plan.take(500)}")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rewrite also matches the reversed operand order abs(r - l)") {
    spark.experimental.extraOptimizations = saved :+ BandJoinRewrite
    try {
      val e = Tables.events(spark, sf).select(col("ts"), col("event_id"))
      val band = 600L * 1000000000L
      val df = e.select(col("ts").as("ta"), col("event_id").as("a_id"))
        .join(e.select(col("ts").as("tb"), col("event_id").as("b_id")),
          abs(col("tb") - col("ta")) <= band && col("a_id") < col("b_id"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__band_bucket"),
        s"reversed subtraction must still rewrite: ${plan.take(400)}")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rewrite is exact for ts values adjacent to Long.MinValue") {
    spark.experimental.extraOptimizations = saved :+ BandJoinRewrite
    try {
      import spark.implicits._
      val m = Long.MinValue
      // the in-band pair (m+1, m+2) straddles the lowest representable
      // multiple of 10 — the old subtraction-based bucket wrapped for
      // one side only, dropping the pair
      val a = Seq((m + 1L, 1L), (m + 11L, 2L)).toDF("ta", "a_id")
      val b = Seq((m + 2L, 11L), (m + 30L, 12L)).toDF("tb", "b_id")
      val df = a.join(b, abs(col("ta") - col("tb")) <= 10L)
        .select("a_id", "b_id")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 11L), (2L, 11L)), s"Long.MinValue-edge pairs: $got")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__band_bucket"), s"rule must have fired: ${plan.take(400)}")
    } finally spark.experimental.extraOptimizations = saved
  }

  test("rule leaves equi-joins and non-band thetas untouched") {
    val e = Tables.events(spark, sf).select(col("ts"), col("event_id"), col("user_id"))
    // equi conjunct present → Spark hash-joins already; rule must not fire
    val equi = e.select(col("user_id"), col("ts").as("ta"), col("event_id").as("a_id"))
      .join(e.select(col("user_id"), col("ts").as("tb"), col("event_id").as("b_id")),
        Seq("user_id"))
      .filter(abs(col("ta") - col("tb")) <= 600L * 1000000000L)
    val optimized = BandJoinRewrite(equi.queryExecution.optimizedPlan)
    assert(optimized == equi.queryExecution.optimizedPlan,
      "rule must be a no-op when an equality key exists")
  }
}
