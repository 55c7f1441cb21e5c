package graft

import org.apache.spark.sql.functions._
import graft.plans.IntervalJoinRewrite

/** IntervalJoinRewrite: a pure point-in-interval inner join must
  * produce identical rows with and without the rule, and with the rule
  * the plan must be an equi-join on the bin bucket rather than a
  * nested loop.
  */
class IntervalJoinRewriteSpec extends SparkSpec {

  private var saved: Seq[org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] = Nil

  override def beforeAll(): Unit = {
    super.beforeAll()
    saved = spark.experimental.extraOptimizations
  }

  // shared singleton session — never leak the rewrite or width conf
  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations = saved
    spark.conf.unset(IntervalJoinRewrite.widthKey)
    super.afterAll()
  }

  private def withRule[A](width: Long)(f: => A): A = {
    spark.experimental.extraOptimizations = saved :+ IntervalJoinRewrite
    spark.conf.set(IntervalJoinRewrite.widthKey, width.toString)
    try f
    finally {
      spark.experimental.extraOptimizations = saved
      spark.conf.unset(IntervalJoinRewrite.widthKey)
    }
  }

  /** clicks (points, epoch s) in any purchase's [s, s+600] window */
  private def windowJoin() = {
    // events.ts is a raw ns-since-epoch long (Tables.events) — derive
    // exact epoch seconds by integer division
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        expr("ts DIV 1000000000").as("sec"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("sec").as("lo"),
        (col("sec") + 600L).as("hi"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("sec").as("pt"))
    c.join(p, col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select("p_id", "c_id")
  }

  test("rewrite preserves the exact pair set of the nested-loop plan") {
    spark.experimental.extraOptimizations = saved
    val expected = windowJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture must produce in-window pairs")

    val got = withRule(600L) {
      windowJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(got == expected,
      s"rewritten join changed results: got ${got.size}, want ${expected.size}")
  }

  test("rewrite turns the nested loop into an equi-join on the bin bucket") {
    withRule(600L) {
      val plan = windowJoin().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join must not nested-loop: ${plan.take(500)}")
      assert(plan.contains("__iv_bucket"), s"bucket key expected in plan: ${plan.take(500)}")
    }
  }

  test("bin width narrower and wider than the interval both stay exact") {
    spark.experimental.extraOptimizations = saved
    val expected = windowJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(7L, 100L, 4000L)) {
      val got = withRule(w) {
        windowJoin().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      assert(got == expected, s"width $w changed the pair set")
    }
  }

  test("inverted and null intervals drop; negative points bucket exactly") {
    withRule(10L) {
      import spark.implicits._
      val iv = Seq((1L, -25L, Some(-5L)), (2L, 30L, Some(20L)), (3L, -100L, Option.empty[Long]))
        .toDF("iv_id", "lo", "hi")
      val pts = Seq((11L, -25L), (12L, -5L), (13L, -26L), (14L, 25L))
        .toDF("pt_id", "pt")
      val df = pts.join(iv, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .select("iv_id", "pt_id")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // iv 2 is inverted (lo > hi): unsatisfiable; iv 3 has a null hi
      assert(got == Set((1L, 11L), (1L, 12L)), s"got $got")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("__iv_bucket"), s"rule must have fired: ${plan.take(400)}")
    }
  }

  test("strict bounds rewrite too, and strictness survives") {
    withRule(10L) {
      import spark.implicits._
      val iv = Seq((1L, 0L, 20L)).toDF("iv_id", "lo", "hi")
      val pts = Seq((11L, 0L), (12L, 20L), (13L, 5L)).toDF("pt_id", "pt")
      val df = pts.join(iv, col("pt") > col("lo") && col("pt") < col("hi"))
        .select("iv_id", "pt_id")
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 13L)), s"strict endpoints must drop: $got")
      assert(df.queryExecution.executedPlan.toString.contains("__iv_bucket"))
    }
  }

  test("rule leaves equi-joins untouched and is a no-op without the width conf") {
    // equi conjunct present → Spark hash-joins already; rule must not fire
    withRule(600L) {
      import spark.implicits._
      val iv = Seq((1L, 0L, 20L, "a")).toDF("iv_id", "lo", "hi", "k")
      val pts = Seq((11L, 5L, "a")).toDF("pt_id", "pt", "k")
      val df = pts.join(iv, pts("k") === iv("k") &&
        col("pt") >= col("lo") && col("pt") <= col("hi"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("__iv_bucket"),
        "rule must be a no-op when an equality key exists")
    }
    // width unset → rule registered but inert
    spark.experimental.extraOptimizations = saved :+ IntervalJoinRewrite
    try {
      val plan = windowJoin().queryExecution.optimizedPlan.toString
      assert(!plan.contains("__iv_bucket"), "rule must be inert without binWidth")
    } finally spark.experimental.extraOptimizations = saved
  }
}
