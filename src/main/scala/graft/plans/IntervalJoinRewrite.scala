package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Catalyst optimizer rule (SURVEY.md §4 extension ladder, step (c)):
  * plans an inner point-in-interval join — the only cross-side
  * predicate is `lo <= p AND p <= hi` with the point on one side and
  * both bounds on the other — as a bucketed equi-join instead of the
  * stock broadcast-nested-loop/cartesian. This is the range-join shape
  * of IP→geo lookups, price-tier banding, and attribution windows;
  * with both sides large, stock Spark's BNLJ is quadratic.
  *
  * Rewrite: pick a bin width w (opt-in via
  * `spark.graft.intervalJoin.binWidth`; the rule is a no-op when
  * unset — width is a data-dependent choice the optimizer has no
  * stats for, mirroring the bin-size hint every production range-join
  * optimization requires). Bucket the point exactly once at
  * `floorDiv(p, w)`; explode the interval side to
  * `sequence(floorDiv(lo, w), floorDiv(hi, w))`; equi-join on the
  * bucket; re-apply the original predicate above the join.
  *
  * Why no duplicates, with no dedup pass: floor division is monotone,
  * so `lo <= p <= hi` implies `bucket(lo) <= bucket(p) <= bucket(hi)`
  * — the point's single bucket is covered by the interval's bucket
  * range exactly once, so every qualifying pair meets on exactly one
  * bucket value. (An interval-interval overlap join needs a
  * first-common-bucket dedup; the point-in-interval shape does not.)
  *
  * Replication cost is `(hi−lo)/w + 1` rows per interval — linear in
  * interval length, chosen by the user via w. Intervals longer than
  * w × MAX_ROUNDED_ARRAY_LENGTH fail fast in `Sequence` rather than
  * silently OOMing an executor. Inverted intervals (lo > hi, predicate
  * unsatisfiable) and null bounds produce a null candidate array and
  * drop at the generate/join, exactly as they drop on the raw
  * predicate; a null point buckets to null and drops on the equi-join.
  *
  * Integral point/bounds only (exactness: no fp bucket drift). The
  * rule skips joins that already carry a cross-side equality — Spark
  * hash-partitions on it and the range conjuncts are a cheap residual
  * — and the rewritten join carries one, so it cannot re-fire inside
  * the fixed-point batch.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val widthKey = "spark.graft.intervalJoin.binWidth"

  private def integral(x: Expression) =
    x.dataType == LongType || x.dataType == IntegerType

  /** Normalize a cross-side inequality conjunct to (smaller, larger).
    * Strict bounds normalize the same way: for bucket COVERAGE a
    * non-strict superset suffices — strictness is enforced by the
    * re-applied original predicate above the join.
    */
  private def asBound(e: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression)] = {
    def ok(x: Expression, y: Expression) =
      ((x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet)) ||
        (x.references.subsetOf(right.outputSet) && y.references.subsetOf(left.outputSet))) &&
        x.references.nonEmpty && y.references.nonEmpty &&
        integral(x) && integral(y) && x.deterministic && y.deterministic
    e match {
      case LessThanOrEqual(a, b) if ok(a, b) => Some((a, b))
      case LessThan(a, b) if ok(a, b) => Some((a, b))
      case GreaterThanOrEqual(a, b) if ok(a, b) => Some((b, a))
      case GreaterThan(a, b) if ok(a, b) => Some((b, a))
      case _ => None
    }
  }

  private def spansBothSides(e: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    e.references.intersect(left.outputSet).nonEmpty &&
      e.references.intersect(right.outputSet).nonEmpty

  /** (point, lo, hi) if the conjuncts bound one point expression from
    * both ends with expressions from the opposite side: some conjunct
    * says p <= hi and another says lo <= p, with p fully on one side
    * and lo, hi both fully on the other.
    */
  private def asInterval(conjuncts: Seq[Expression], left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression)] = {
    val bounds = conjuncts.flatMap(asBound(_, left, right))
    val pairs = for {
      (p1, hi) <- bounds // read as: p1 <= hi
      (lo, p2) <- bounds // read as: lo <= p2
      if p1.semanticEquals(p2) && !lo.semanticEquals(p1) && !hi.semanticEquals(p1)
      pointLeft = p1.references.subsetOf(left.outputSet)
      if (pointLeft && lo.references.subsetOf(right.outputSet) &&
            hi.references.subsetOf(right.outputSet)) ||
         (!pointLeft && lo.references.subsetOf(left.outputSet) &&
            hi.references.subsetOf(left.outputSet))
    } yield (p1, lo, hi)
    pairs.headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = try conf.getConfString(widthKey, "").toLong catch { case _: NumberFormatException => 0L }
    if (width <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case e @ EqualTo(_, _) => spansBothSides(e, left, right)
          case e @ EqualNullSafe(_, _) => spansBothSides(e, left, right)
          case _ => false
        }
        val iv = if (hasEqui) None else asInterval(conjuncts, left, right)
        iv match {
          case Some((p, lo, hi)) =>
            val w = Literal(width, LongType)
            def toLong(e: Expression) =
              if (e.dataType == LongType) e else Cast(e, LongType)
            // exact floor division for any sign (BandJoinRewrite note:
            // `div` + truncation fixup never leaves the long range)
            def bucketOf(e: Expression) = {
              val x = toLong(e)
              Add(IntegralDivide(x, w),
                If(LessThan(Remainder(x, w), Literal(0L)),
                  Literal(-1L), Literal(0L)))
            }
            val pointLeft = p.references.subsetOf(left.outputSet)
            val (pointPlan, ivPlan) = if (pointLeft) (left, right) else (right, left)

            val pBucket = Alias(bucketOf(p), "__iv_bucket_p")()
            val pSide = Project(pointPlan.output :+ pBucket, pointPlan)

            // candidate buckets for the interval; null/inverted → null
            // array → null bucket row (outer=true) → drops at the join
            // Sequence is TimeZoneAwareExpression — it is unresolved
            // until a zone is pinned, even for a pure long sequence
            val seqExpr = If(LessThanOrEqual(toLong(lo), toLong(hi)),
              new Sequence(bucketOf(lo), bucketOf(hi), Some(Literal(1L)),
                Some(conf.sessionLocalTimeZone)),
              Literal(null, ArrayType(LongType, containsNull = false)))
            val ivBucket = AttributeReference("__iv_bucket", LongType)()
            val probes = Generate(
              Explode(seqExpr),
              unrequiredChildIndex = Nil, outer = true, qualifier = None,
              generatorOutput = Seq(ivBucket), child = ivPlan)
            val ivSide = Project(ivPlan.output :+ ivBucket, probes)

            val eq = EqualTo(pBucket.toAttribute, ivBucket)
            val bucketJoin =
              if (pointLeft) Join(pSide, ivSide, Inner, Some(eq), hint)
              else Join(ivSide, pSide, Inner, Some(eq), hint)
            Project(j.output, Filter(cond, bucketJoin))
          case None => j
        }
    }
  }
}
