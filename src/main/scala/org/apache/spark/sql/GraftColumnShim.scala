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
}
