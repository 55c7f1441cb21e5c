package graft.functions

import org.apache.spark.sql.catalyst.expressions.{GreaterThan, If, IsNull, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule (SURVEY.md §4 extension ladder, step (c)):
  * ALGEBRAIC simplification of the native vector expressions, injected
  * via GraftExtensions.injectOptimizerRule.
  *
  * `vector_cosine(x, x)` folds to the mathematically exact 1.0 whenever
  * dot(x,x) is finite and positive (NaN when the norm is 0 or the
  * vector contains NaN/Inf; null when x is null) — one d-element loop
  * instead of three.
  *
  * NOTE this is an algebraic rewrite, not a bit-exact one: the
  * unoptimized floating evaluation of d/(√d·√d) can land 1 ulp off 1.0.
  * That is why the rule ships in GraftExtensions (opt-in deployments)
  * and is NOT active in Verify/Bench sessions — the oracle contract
  * (SURVEY.md §7.5) requires unoptimized-identical results.
  */
object SimplifySelfCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case VectorCosine(a, b) if a.semanticEquals(b) && a.deterministic =>
        val d = VectorDot(a, a)
        If(IsNull(a), Literal(null, DoubleType),
          If(org.apache.spark.sql.catalyst.expressions.And(
              GreaterThan(d, Literal(0.0, DoubleType)),
              LessThan(d, Literal(Double.PositiveInfinity, DoubleType))),
            Literal(1.0, DoubleType),
            Literal(Double.NaN, DoubleType)))
    }
}
