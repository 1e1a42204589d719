package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite a naive point-in-interval join into
  * the bucketed equi-join `core/RangeJoin` builds by hand.
  *
  * A join whose only cross-side predicates are range bounds
  * (`p >= lo AND p <= hi` with `p` on one side, `lo`/`hi` on the
  * other) has no equi-key, so stock Spark plans a nested loop —
  * quadratic unless one side broadcasts. With a bucket width W
  * configured (`spark.graft.rangeJoin.bucketWidth`, the same knob as
  * a range-join hint), this rule:
  *
  *   - tags every point row with its bucket `B(p)`;
  *   - explodes every interval row to the buckets `B(lo) .. B(hi)` it
  *     covers (`Generate(Explode(Sequence(...)))`);
  *   - joins on bucket equality, KEEPING the original predicates, so
  *     the exact bounds filter only co-bucketed candidates.
  *
  * Two bucket functions, by the candidate's types:
  *
  *   - **integral** (byte/short/int/long): `B(x) = x div W` — integer
  *     division by W > 0 is monotone, so `lo <= p <= hi` implies
  *     `B(lo) <= B(p) <= B(hi)`: every true pair lands in the exploded
  *     bucket set, and a point owns exactly ONE bucket so no pair can
  *     appear twice.
  *   - **floating** (float/double, and decimals of precision ≤ 15 —
  *     exactly representable in a double): `B(x) = floor(x / W)` over
  *     doubles (IEEE division and floor are monotone, same argument).
  *     Floating values admit NaN/±Inf, whose Spark comparison
  *     semantics (NaN sorts above everything) a finite bucket range
  *     cannot express — those rows route through a single CATCH-ALL
  *     bucket instead: every point additionally owns the catch-all
  *     bucket, and an interval with a non-finite bound emits ONLY the
  *     catch-all bucket (never a bucket sequence), so non-finite
  *     intervals meet every point exactly once and the retained exact
  *     predicates decide. The point side therefore fans out 2× (its
  *     bucket + catch-all) — confined to the floating path.
  *
  * Degenerate intervals (`lo > hi`) generate a clamped one-bucket
  * sequence whose candidates the retained original bounds reject.
  * Joins that already carry an equality conjunct are left alone (Spark
  * hash-joins those natively).
  *
  * Supported join shapes: the STREAMED/preserved side must not be the
  * exploded one, and its per-row multiplicity must be preserved —
  *
  *   - `Inner`: points on either side (both paths);
  *   - `LeftSemi` / `LeftAnti` / `LeftOuter`: points on the LEFT
  *     (the left side gains only a projected bucket column, row for
  *     row, so EXISTS/NOT-EXISTS/null-extension semantics carry);
  *   - `RightOuter`: points on the RIGHT, symmetrically;
  *   - floating path: `Inner` only (the 2× point fan-out would break
  *     preserved-side multiplicity).
  *
  * Installed via `GraftFunctions.install(spark)` (live session) or the
  * `graft.functions.GraftExtensions` session-extensions class
  * (deployment-time `spark.sql.extensions=`).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  private val BucketName = "__graft_bucket"

  /** Catch-all bucket id for non-finite floating rows. A finite
    * double bucket can only collide with it by saturating
    * `floor(x/W)` at Long.MinValue — at which point the interval's
    * bucket sequence is astronomically long anyway (width far too
    * small for the data); the point side dedups via array_distinct. */
  private val CatchAll = Long.MinValue

  private sealed trait Path
  private case object IntPath extends Path
  private case object DblPath extends Path

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Types whose every value converts EXACTLY to a double (so the
    * floating bucket function is value-faithful): float/double
    * trivially; int32 and below (< 2^53); decimals of ≤ 15 digits
    * (999,999,999,999,999 < 2^53). Longs are excluded — beyond 2^53
    * the cast rounds and bucket boundaries would shift. */
  private def dblSafe(e: Expression): Boolean = e.dataType match {
    case FloatType | DoubleType => true
    case ByteType | ShortType | IntegerType => true
    case dt: DecimalType if dt.precision <= 15 => true
    case _ => false
  }

  private def pathOf(p: Expression, lo: Expression, hi: Expression): Option[Path] =
    if (integral(p) && integral(lo) && integral(hi)) Some(IntPath)
    else if (dblSafe(p) && dblSafe(lo) && dblSafe(hi)) Some(DblPath)
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toLong
    if (width <= 0) plan
    else plan.transform {
      case j @ Join(_, _, Inner | LeftSemi | LeftAnti | LeftOuter | RightOuter,
          Some(cond), _) =>
        rewrite(j, cond, width).getOrElse(j)
    }
  }

  /** (point attr, bound expr, bound-is-lower) for a range conjunct
    * where one side is a lone attribute of a supported type. */
  private def asBound(e: Expression): Option[(Attribute, Expression, Boolean)] = {
    def ok(p: Attribute) = integral(p) || dblSafe(p)
    e match {
      case GreaterThanOrEqual(p: Attribute, b) if ok(p) => Some((p, b, true))
      case GreaterThan(p: Attribute, b) if ok(p) => Some((p, b, true))
      case LessThanOrEqual(p: Attribute, b) if ok(p) => Some((p, b, false))
      case LessThan(p: Attribute, b) if ok(p) => Some((p, b, false))
      case GreaterThanOrEqual(b, p: Attribute) if ok(p) => Some((p, b, false))
      case GreaterThan(b, p: Attribute) if ok(p) => Some((p, b, false))
      case LessThanOrEqual(b, p: Attribute) if ok(p) => Some((p, b, true))
      case LessThan(b, p: Attribute) if ok(p) => Some((p, b, true))
      case _ => None
    }
  }

  private def rewrite(j: Join, cond: Expression, width: Long): Option[LogicalPlan] = {
    val Join(left, right, joinType, _, hint) = j
    val conjuncts = splitConjunctivePredicates(cond)
    // an equality between the sides means Spark already has a hash key
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSide(a, b, left, right)
      case EqualNullSafe(a, b) => crossSide(a, b, left, right)
      case _ => false
    }
    if (hasEqui) return None

    // candidate: a supported-type attribute p bounded below AND above
    // by deterministic expressions rooted entirely in the opposite side
    val bounds = conjuncts.flatMap(asBound).filter { case (p, b, _) =>
      b.deterministic && b.references.nonEmpty &&
        (integral(b) || dblSafe(b)) && {
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
      pathOf(p, lo, hi).flatMap { path =>
        // the preserved side must keep its row multiplicity: it can
        // gain a projected column but never be exploded (and the
        // floating path explodes the POINT side 2×, so only Inner)
        val shapeOk = joinType match {
          case Inner => true
          case LeftSemi | LeftAnti | LeftOuter => pointOnLeft
          case RightOuter => !pointOnLeft
          case _ => false
        }
        if (!shapeOk || (path == DblPath && joinType != Inner)) None
        else Some(build(j, conjuncts, width, p, lo, hi, pointOnLeft, path))
      }
    }
  }

  private def build(j: Join, conjuncts: Seq[Expression], width: Long,
      p: Attribute, lo: Expression, hi: Expression,
      pointOnLeft: Boolean, path: Path): LogicalPlan = {
    val Join(left, right, joinType, _, hint) = j
    val (points, intervals) = if (pointOnLeft) (left, right) else (right, left)
    val tz = conf.sessionLocalTimeZone
    val bAttr = AttributeReference(BucketName + "_i", LongType,
      nullable = true)()

    val (pointsB, pointBucket, gen) = path match {
      case IntPath =>
        def div(e: Expression): Expression =
          IntegralDivide(Cast(e, LongType), Literal(width))
        val pbAlias = Alias(div(p), BucketName)()
        // a degenerate interval (lo > hi) would make the explicit-step
        // Sequence throw; clamp stop to start so it emits one bucket
        // row that the retained exact bounds then reject
        val g = Generate(
          Explode(new Sequence(div(lo),
            Greatest(Seq(div(lo), div(hi))), Some(Literal(1L)))
            .withTimeZone(tz)),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(bAttr), child = intervals)
        (Project(points.output :+ pbAlias, points),
          pbAlias.toAttribute: Expression, g)

      case DblPath =>
        def dbl(e: Expression): Expression = Cast(e, DoubleType)
        def div(e: Expression): Expression =
          Floor(Divide(dbl(e), Literal(width.toDouble))) // LongType
        def finite(e: Expression): Expression = {
          val d = dbl(e)
          And(Not(IsNaN(d)),
            And(Not(EqualTo(d, Literal(Double.PositiveInfinity))),
              Not(EqualTo(d, Literal(Double.NegativeInfinity)))))
        }
        val emptyArr =
          Literal.create(Seq.empty[Long], ArrayType(LongType, false))
        // every point owns its bucket AND the catch-all (distinct in
        // case floor saturation makes them equal); a null point emits
        // only the catch-all (the exact predicates reject it anyway,
        // and for Inner nothing is preserved)
        val pArr = If(IsNull(p), CreateArray(Seq(Literal(CatchAll))),
          ArrayDistinct(CreateArray(Seq(div(p), Literal(CatchAll)))))
        val pAttr = AttributeReference(BucketName + "_p", LongType,
          nullable = true)()
        val pGen = Generate(Explode(pArr),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(pAttr), child = points)
        // finite intervals explode to their (clamped) bucket range;
        // non-finite ones emit ONLY the catch-all row; null-bounded
        // ones emit nothing (they can never match)
        val iArr = If(Or(IsNull(lo), IsNull(hi)), emptyArr,
          If(And(finite(lo), finite(hi)),
            new Sequence(div(lo), Greatest(Seq(div(lo), div(hi))),
              Some(Literal(1L))).withTimeZone(tz),
            CreateArray(Seq(Literal(CatchAll)))))
        val g = Generate(Explode(iArr),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(bAttr), child = intervals)
        (pGen, pAttr: Expression, g)
    }

    val bucketEq = EqualTo(pointBucket, bAttr)
    val (newLeft, newRight) =
      if (pointOnLeft) (pointsB, gen) else (gen, pointsB)
    val newJoin = Join(newLeft, newRight, joinType,
      Some((bucketEq +: conjuncts).reduce(And)), hint)
    Project(j.output, newJoin)
  }

  private def crossSide(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.nonEmpty && b.references.nonEmpty) &&
      ((a.references.subsetOf(left.outputSet) &&
        b.references.subsetOf(right.outputSet)) ||
       (a.references.subsetOf(right.outputSet) &&
        b.references.subsetOf(left.outputSet)))
}
