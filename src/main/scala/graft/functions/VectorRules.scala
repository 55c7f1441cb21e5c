package graft.functions

import org.apache.spark.sql.catalyst.expressions.{EqualTo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule (SURVEY.md §4 extension ladder, step (c)):
  * algebraic simplification of the native vector expressions, injected
  * via GraftExtensions.injectOptimizerRule.
  *
  * `vector_cosine(x, x)` = dot(x,x) / (√dot(x,x) · √dot(x,x)), which is
  * exactly 1.0 whenever dot(x,x) ≠ 0, NaN when it is 0, null when x is
  * null. The rewrite preserves those semantics bit-for-bit but computes
  * ONE d-element loop (the zero guard) instead of three — the common
  * self-similarity normalisation pattern gets 3× cheaper without the
  * caller changing anything.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VectorCosine(a, b) if a.semanticEquals(b) && a.deterministic =>
        If(IsNull(a), Literal(null, DoubleType),
          If(EqualTo(VectorDot(a, a), Literal(0.0, DoubleType)),
            Literal(Double.NaN, DoubleType),
            Literal(1.0, DoubleType)))
    }
}
