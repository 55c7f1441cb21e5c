package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule (SURVEY.md §4 extension ladder, step (c)):
  * plans an inner join whose ONLY cross-side predicate is an integral
  * band `abs(l.ts − r.ts) <= c` as a bucketed equi-join instead of the
  * stock broadcast-nested-loop/cartesian.
  *
  * Same rewrite `graft.pipeline.BandJoin.absBand` applies by hand:
  * bucket both sides into band-width bins (exact integer floor
  * division — no doubles, so ns-scale longs cannot lose adjacency to
  * fp error), replicate the left row to its two adjacent buckets via a
  * 3-literal explode, equi-join on the bucket, and re-apply the
  * original predicate above the join. Every in-band pair shares
  * exactly one (left bucket+probe, right bucket) combination, so no
  * duplicates are produced and inner semantics are preserved;
  * null-ts rows bucket to null and drop on the equi-join exactly as
  * they dropped on the null band predicate.
  *
  * Domain note: the rewrite treats the band as TRUE arithmetic
  * `|l − r| <= c`. In non-ANSI mode the raw nested-loop predicate can
  * also "accept" a pair at opposite extremes of the long range whose
  * subtraction wraps around into [−c, c]; such wraparound pairs are not
  * in-band under real arithmetic and the bucketed plan (exact for every
  * representable value) does not produce them.
  *
  * The rule fires only when no equality conjunct spans the join (if one
  * exists Spark already hash-partitions on it and the band is a cheap
  * residual condition), and only for integral ts/band (exactness).
  * After the rewrite the join carries an equality, so the rule cannot
  * re-fire inside the fixed-point batch.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** (leftTs, rightTs, band) for a conjunct like abs(l − r) <= c. */
  private def asBand(e: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Long)] = {
    def sides(x: Expression, y: Expression): Option[(Expression, Expression)] =
      if (x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet))
        Some((x, y))
      else if (y.references.subsetOf(left.outputSet) && x.references.subsetOf(right.outputSet))
        Some((y, x))
      else None
    def integral(x: Expression) =
      x.dataType == LongType || x.dataType == IntegerType
    object Band {
      def unapply(b: Expression): Option[(Expression, Expression)] = b match {
        case Abs(Subtract(x, y, _), _) => Some((x, y))
        case _ => None
      }
    }
    object IntLit {
      def unapply(l: Expression): Option[Long] = l match {
        case Literal(c: Long, LongType) => Some(c)
        case Literal(c: Int, IntegerType) => Some(c.toLong)
        case _ => None
      }
    }
    val absBand = e match {
      case LessThanOrEqual(Band(x, y), IntLit(c)) => Some((x, y, c))
      case GreaterThanOrEqual(IntLit(c), Band(x, y)) => Some((x, y, c))
      case LessThan(Band(x, y), IntLit(c)) => Some((x, y, c - 1))
      case GreaterThan(IntLit(c), Band(x, y)) => Some((x, y, c - 1))
      case _ => None
    }
    absBand.collect {
      case (x, y, c) if c > 0 && integral(x) && integral(y) && x.deterministic && y.deterministic =>
        sides(x, y).map { case (l, r) => (l, r, c) }
    }.flatten
  }

  private def spansBothSides(e: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    e.references.intersect(left.outputSet).nonEmpty &&
      e.references.intersect(right.outputSet).nonEmpty

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => spansBothSides(EqualTo(a, b), left, right)
        case EqualNullSafe(a, b) => spansBothSides(EqualNullSafe(a, b), left, right)
        case _ => false
      }
      val band = if (hasEqui) None
                 else conjuncts.view.flatMap(asBand(_, left, right)).headOption
      band match {
        case Some((lTs, rTs, c)) =>
          val bandLit = Literal(c, LongType)
          def toLong(e: Expression) =
            if (e.dataType == LongType) e else Cast(e, LongType)
          // exact overflow-free floor division for any sign: `x div c`
          // with a truncation fixup. The previous (x - pmod(x, c)) div c
          // was exact except within c of Long.MinValue, where the
          // subtraction wraps (non-ANSI: silent wrong bucket → dropped
          // in-band pairs) or throws (ANSI). `div` by a positive c never
          // overflows, `%` neither, and for c = 1 the fixup branch is
          // dead (x % 1 = 0), so no term here can leave the long range.
          def bucketOf(e: Expression) = {
            val x = toLong(e)
            Add(IntegralDivide(x, bandLit),
              If(LessThan(Remainder(x, bandLit), Literal(0L)),
                Literal(-1L), Literal(0L)))
          }
          val rBucket = Alias(bucketOf(rTs), "__band_bucket")()
          val rSide = Project(right.output :+ rBucket, right)
          // the left row probes its own and both adjacent buckets. The
          // candidate array is built conditionally so the ±1 neighbor is
          // omitted at the representable extremes (reachable only when
          // c = 1 and ts = Long.Min/MaxValue): no long can bucket beyond
          // them, and If branches evaluate lazily, so the skipped
          // arithmetic cannot overflow even under ANSI. outer = true:
          // the array is never null/empty, and it keeps
          // InferFiltersFromGenerate from cloning the array build into a
          // non-codegen Filter.
          val base = Alias(bucketOf(lTs), "__band_base")()
          val baseRef = base.toAttribute
          val lProj = Project(left.output :+ base, left)
          def arr(es: Expression*) = CreateArray(es)
          val candidates = If(EqualTo(baseRef, Literal(Long.MaxValue)),
            arr(Subtract(baseRef, Literal(1L)), baseRef),
            If(EqualTo(baseRef, Literal(Long.MinValue)),
              arr(baseRef, Add(baseRef, Literal(1L))),
              arr(Subtract(baseRef, Literal(1L)), baseRef,
                Add(baseRef, Literal(1L)))))
          val lBucket = AttributeReference("__band_bucket_l", LongType)()
          val probes = Generate(
            Explode(candidates),
            unrequiredChildIndex = Nil, outer = true, qualifier = None,
            generatorOutput = Seq(lBucket), child = lProj)
          val lSide = Project(left.output :+ lBucket, probes)
          val bucketJoin = Join(lSide, rSide, Inner,
            Some(EqualTo(lBucket, rBucket.toAttribute)), hint)
          Project(j.output, Filter(cond, bucketJoin))
        case None => j
      }
  }
}
