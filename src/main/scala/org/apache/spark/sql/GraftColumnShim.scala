package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: `classic.ExpressionUtils` is `private[sql]`, so wrapping
  * a custom Catalyst Expression into a public `Column` needs one object
  * inside the org.apache.spark.sql package — the standard pattern for
  * libraries that ship native expressions (the JVM-level members are
  * public; only the Scala access modifier is narrowed).
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a custom LogicalPlan into a public DataFrame (classic
    * Dataset.ofRows is `private[sql]`): needed to expose custom plan
    * nodes (graft.plans.AsofJoinNode) through the DataFrame API.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}
