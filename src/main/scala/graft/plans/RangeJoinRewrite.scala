package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Catalyst optimizer rule: rewrite a pure point-in-interval INNER join
  * (`l.v >= r.lo AND l.v <= r.hi`, no equi conjunct) into the binned
  * equi-join shape — the logical-plan automation of
  * [[graft.operators.Joins.rangeJoin]] (q82).
  *
  * Stock Spark plans an inequality-only join as a BroadcastNestedLoopJoin —
  * O(|L|·|R|) compares, the operator that dies first at scale. With a bin
  * width `w` (opt-in via `spark.graft.rangeJoin.binWidth`), the rule
  *
  *  1. projects `bin = floor(v / w)` onto the point side,
  *  2. explodes each interval row to its covered bins
  *     (`sequence(floor(lo/w), floor(hi/w))`) behind a `lo <= hi` filter
  *     (empty intervals can't match an inner join, and `sequence` would
  *     throw on a negative range),
  *  3. joins on bin equality with the ORIGINAL predicate kept as residual —
  *     bins are a candidate superset; the residual keeps exactness, and a
  *     strict (`<`/`>`) original bound stays strict.
  *
  * The result is a plain shuffled/broadcast HASH join Catalyst plans
  * normally. Cost: interval rows duplicate ×(span/w + 1) — the user picks
  * `w` near the typical interval span, exactly the knob the manual operator
  * exposes.
  *
  * Demonstrates the `SparkSessionExtensions` + `Rule[LogicalPlan]`
  * extension path (SURVEY §7.2 preference (c)); registered by
  * [[GraftExtensions]] in every `Engine.configure` session. Inert unless
  * the conf key is set. Idempotent under the optimizer's fixed-point batch:
  * the rewritten join HAS an equi conjunct, which the guard rejects.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val BIN_WIDTH_KEY = "spark.graft.rangeJoin.binWidth"

  /** floor(e / w) as int64 — Floor(double) is LongType in Spark. */
  private def bin(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  private def spansBoth(a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
    (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))

  /** Normalize one comparison conjunct into candidate (point, bound, isLower)
    * readings — both operand orders are tried; the caller resolves which side
    * the point lives on.
    */
  private def readings(e: Expression): Seq[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
    case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
    case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
    case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
    case _                        => Seq.empty
  }

  /** Find (point, lo, hi, pointOnLeft): a numeric expression bounded below
    * and above, point referencing only one side and both bounds only the
    * other.
    */
  private def findBounds(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val all = conjuncts.flatMap(readings)
    val candidates = for {
      (p1, lo, true) <- all
      (p2, hi, false) <- all
      if p1.semanticEquals(p2)
      if p1.dataType.isInstanceOf[NumericType] &&
        lo.dataType.isInstanceOf[NumericType] &&
        hi.dataType.isInstanceOf[NumericType]
      pointOnLeft <- (
        if (p1.references.subsetOf(left.outputSet) &&
            lo.references.subsetOf(right.outputSet) &&
            hi.references.subsetOf(right.outputSet) &&
            lo.references.nonEmpty) Some(true)
        else if (p1.references.subsetOf(right.outputSet) &&
            lo.references.subsetOf(left.outputSet) &&
            hi.references.subsetOf(left.outputSet) &&
            lo.references.nonEmpty) Some(false)
        else None)
    } yield (p1, lo, hi, pointOnLeft)
    candidates.headOption
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val wStr = conf.getConfString(BIN_WIDTH_KEY, "")
    if (wStr.isEmpty) return plan
    // a malformed/non-positive width disables the rule rather than failing
    // every optimization pass in the session
    val w = scala.util.Try(wStr.toDouble).getOrElse(0.0)
    if (!(w > 0) || w.isInfinite) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if !hasEquiAcross(j) =>
        findBounds(splitConjunctivePredicates(cond), left, right) match {
          case Some((point, lo, hi, pointOnLeft)) =>
            val (pointSide, intervalSide) = if (pointOnLeft) (left, right) else (right, left)
            val binAlias = Alias(bin(point, w), "__graft_bin_p")()
            val binnedPoint = Project(pointSide.output :+ binAlias, pointSide)
            val genOut = AttributeReference("__graft_bin_i", LongType, nullable = false)()
            val gen = Generate(
              // Sequence is TimeZoneAwareExpression: resolution requires a
              // concrete timeZoneId even for integral sequences
              Explode(Sequence(bin(lo, w), bin(hi, w), Some(Literal(1L)),
                Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(genOut),
              Filter(LessThanOrEqual(lo, hi), intervalSide))
            val newCond = And(EqualTo(binAlias.toAttribute, genOut), cond)
            val newJoin =
              if (pointOnLeft) Join(binnedPoint, gen, Inner, Some(newCond), hint)
              else Join(gen, binnedPoint, Inner, Some(newCond), hint)
            Project(j.output, newJoin)
          case None => j
        }
    }
  }

  private def hasEquiAcross(j: Join): Boolean =
    j.condition.exists(c => splitConjunctivePredicates(c).exists {
      case EqualTo(a, b)       => spansBoth(a, b, j.left, j.right)
      case EqualNullSafe(a, b) => spansBoth(a, b, j.left, j.right)
      case _                   => false
    })
}

/** Session-extension installer (`spark.sql.extensions` class form or
  * `SparkSession.builder.withExtensions`): injects [[RangeJoinRewrite]]
  * into the operator-optimization batch.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
