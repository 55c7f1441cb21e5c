package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import graft.functions.{GraftExtensions, GraftFunctions, SimplifySelfCosine}

class VectorRulesSpec extends SparkSpec {

  // injectOptimizerRule is config-time and getOrCreate reuses the shared
  // test session, so the rule is exercised via the public runtime hook;
  // GraftExtensions wiring itself is applied to a bare extensions object.
  private var saved: Seq[org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] = Nil

  override def beforeAll(): Unit = {
    super.beforeAll()
    saved = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = saved :+ SimplifySelfCosine
  }

  // the session is a process-wide singleton — leaking the rewrite would
  // change what later suites measure
  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations = saved
    super.afterAll()
  }

  test("GraftExtensions wires functions and rules without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("self-cosine folds to a constant: no vector_cosine left in the optimized plan") {
    val emb = Tables.embeddings(spark, sf)
    val df = emb.select(GraftFunctions.vectorCosine(col("embedding"), col("embedding")).as("c"))
    val optimized = df.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("vector_cosine"),
      s"rule must fold self-cosine: $optimized")
    // semantics preserved: embeddings are non-null, non-zero → exactly 1.0
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.nonEmpty && vals.forall(_ == 1.0))
  }

  test("fold keeps null and zero-vector semantics") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(0.0f, 0.0f))),
      (2L, Option.empty[Array[Float]]),
      (3L, Some(Array(1.0f, 0.0f))))
      .toDF("id", "embedding")
    val out = df.select(col("id"),
      GraftFunctions.vectorCosine(col("embedding"), col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L).asInstanceOf[Double].isNaN, "zero vector → NaN")
    assert(out(2L) == null, "null vector → null")
    assert(out(3L) == 1.0)
  }
}
