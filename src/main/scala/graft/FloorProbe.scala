package graft

import org.apache.spark.sql.SparkSession

/** Dev instrument for the per-key bench FLOOR (round-9 verdict next-1b):
  * where do the milliseconds of a trivial key go — Dataset construction
  * + analysis, optimization, physical planning, or the job itself?
  * Round 8 falsified construction-time as the floor (prepared mode won
  * nothing); this slices the remaining pipeline per phase so the floor
  * is measured, not guessed.
  *
  * Per key and iteration it forces, in order, each lazy stage of
  * `df.count()`'s QueryExecution and stamps the deltas:
  *   construct  — SparkEntry.queries(key)(...) + .count() Dataset build
  *   analyze    — qe.analyzed
  *   optimize   — qe.optimizedPlan (cache lookup + optimizer rules)
  *   plan       — qe.executedPlan (strategies + physical preparations)
  *   execute    — the collect job itself (DAG scheduling + tasks)
  *
  * Usage: sbt "runMain graft.FloorProbe win_running scan_parquet" —
  * defaults to a spread of trivial keys. Config mirrors Bench exactly.
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val keys = if (args.nonEmpty) args.toSeq
      else Seq("win_running", "scan_parquet", "project_expr", "text_tokens",
        "agg_global", "filter_pred")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "5").toInt
    // warmup: JIT + codegen caches, same as Bench
    keys.foreach { k =>
      try SparkEntry.queries(k)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    println(f"${"key"}%-28s ${"construct"}%9s ${"analyze"}%9s ${"optimize"}%9s ${"plan"}%9s ${"execute"}%9s ${"total"}%9s  (min ms over $iters iters)")
    for (key <- keys) {
      val slices = (1 to iters).map { _ =>
        var t = System.nanoTime()
        def lap(): Double = { val n = System.nanoTime(); val d = (n - t) / 1e6; t = n; d }
        val counted = SparkEntry.queries(key)(spark, sfDir).groupBy().count()
        val qe = counted.queryExecution
        val tConstruct = lap()
        qe.analyzed
        val tAnalyze = lap()
        qe.optimizedPlan
        val tOptimize = lap()
        qe.executedPlan
        val tPlan = lap()
        counted.collect()
        val tExec = lap()
        Seq(tConstruct, tAnalyze, tOptimize, tPlan, tExec)
      }
      // min per phase: the steady-state floor of each slice
      val mins = (0 until 5).map(i => slices.map(_(i)).min)
      // and the min TOTAL (phases of the same iteration), the honest key floor
      val minTotal = slices.map(_.sum).min
      println(f"$key%-28s ${mins(0)}%9.1f ${mins(1)}%9.1f ${mins(2)}%9.1f ${mins(3)}%9.1f ${mins(4)}%9.1f $minTotal%9.1f")
    }
    spark.stop()
  }
}
