package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Catalyst optimizer rule: rewrite a naive point-in-interval join into
  * the bucketed equi-join `core/RangeJoin` builds by hand.
  *
  * A join whose only cross-side predicates are range bounds
  * (`p >= lo AND p <= hi` with `p` integral on one side, `lo`/`hi` on
  * the other) has no equi-key, so stock Spark plans a nested loop —
  * quadratic unless one side broadcasts. With a bucket width W
  * configured (`spark.graft.rangeJoin.bucketWidth`, the same knob as
  * a range-join hint), this rule:
  *
  *   - tags every point row with its bucket `p div W`;
  *   - explodes every interval row to the buckets `lo div W .. hi div W`
  *     it covers (`Generate(Explode(Sequence(...)))`);
  *   - joins on bucket equality, KEEPING the original predicates, so
  *     the exact bounds filter only co-bucketed candidates.
  *
  * The rewrite is exactly semantics-preserving: integer division by
  * W > 0 is monotone, so `lo <= p <= hi` implies
  * `B(lo) <= B(p) <= B(hi)` — every true pair lands in the exploded
  * bucket set — and a point owns exactly ONE bucket, so no pair can
  * appear twice. Degenerate intervals (`lo > hi`) generate a
  * descending sequence whose candidates the retained original bounds
  * reject. Joins that already carry an equality conjunct are left
  * alone (Spark hash-joins those natively).
  *
  * Installed via `GraftFunctions.install(spark)` (live session) or the
  * `graft.functions.GraftExtensions` session-extensions class
  * (deployment-time `spark.sql.extensions=`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private val BucketName = "__graft_bucket"

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toLong
    if (width <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, width).getOrElse(j)
    }
  }

  /** (point attr, bound expr, bound-is-lower) for a range conjunct
    * where one side is a lone integral attribute. */
  private def asBound(e: Expression): Option[(Attribute, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(p: Attribute, b) if integral(p) => Some((p, b, true))
      case GreaterThan(p: Attribute, b) if integral(p) => Some((p, b, true))
      case LessThanOrEqual(p: Attribute, b) if integral(p) => Some((p, b, false))
      case LessThan(p: Attribute, b) if integral(p) => Some((p, b, false))
      case GreaterThanOrEqual(b, p: Attribute) if integral(p) => Some((p, b, false))
      case GreaterThan(b, p: Attribute) if integral(p) => Some((p, b, false))
      case LessThanOrEqual(b, p: Attribute) if integral(p) => Some((p, b, true))
      case LessThan(b, p: Attribute) if integral(p) => Some((p, b, true))
      case _ => None
    }

  private def rewrite(j: Join, cond: Expression, width: Long): Option[LogicalPlan] = {
    val Join(left, right, _, _, hint) = j
    val conjuncts = splitConjunctivePredicates(cond)
    // an equality between the sides means Spark already has a hash key
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b, left, right)
      case EqualNullSafe(a, b) => crossSide(a, b, left, right)
      case _ => false
    }
    if (hasEqui) return None

    // candidate: integral attribute p bounded below AND above by
    // deterministic expressions rooted entirely in the opposite side
    val bounds = conjuncts.flatMap(asBound).filter { case (p, b, _) =>
      b.deterministic && b.references.nonEmpty && integral(b) && {
        val pLeft = left.outputSet.contains(p)
        val other = if (pLeft) right else left
        b.references.subsetOf(other.outputSet) &&
          (pLeft || right.outputSet.contains(p))
      }
    }
    val byAttr = bounds.groupBy(_._1)
    val candidate = byAttr.collectFirst {
      case (p, bs) if bs.exists(_._3) && bs.exists(!_._3) =>
        (p, bs.find(_._3).get._2, bs.find(!_._3).get._2)
    }
    candidate.flatMap { case (p, lo, hi) =>
      val pointOnLeft = left.outputSet.contains(p)
      val (points, intervals) = if (pointOnLeft) (left, right) else (right, left)

      def div(e: Expression): Expression =
        IntegralDivide(Cast(e, LongType), Literal(width))

      val pbAlias = Alias(div(p), BucketName)()
      val pointsB = Project(points.output :+ pbAlias, points)
      val bAttr = AttributeReference(BucketName + "_i", LongType,
        nullable = true)()
      // a degenerate interval (lo > hi) would make the explicit-step
      // Sequence throw; clamp stop to start so it emits one bucket row
      // that the retained exact bounds then reject
      val gen = Generate(
        Explode(new Sequence(div(lo),
          Greatest(Seq(div(lo), div(hi))), Some(Literal(1L)))
          .withTimeZone(conf.sessionLocalTimeZone)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(bAttr), child = intervals)
      val bucketEq = EqualTo(pbAlias.toAttribute, bAttr)
      val (newLeft, newRight) =
        if (pointOnLeft) (pointsB, gen) else (gen, pointsB)
      val newJoin = Join(newLeft, newRight, Inner,
        Some((bucketEq +: conjuncts).reduce(And)), hint)
      Some(Project(j.output, newJoin))
    }
  }

  private def crossSide(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.nonEmpty && b.references.nonEmpty) &&
      ((a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
       (a.references.subsetOf(right.outputSet) &&
        b.references.subsetOf(left.outputSet)))
}
