package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, TimestampType}

/** Catalyst optimizer rule: rewrite a join whose condition is PURE range
  * predicates (no cross-side equality anywhere — the shape Spark can only
  * plan as an O(n·m) BroadcastNestedLoopJoin or cartesian) into the
  * bin-replicated equi-join that `operators.RangeJoin` spells by hand:
  *
  *   A ⋈[p ≥ lo ∧ p ≤ hi ∧ rest] B
  *     ⇒ Project(A.out ∪ B.out,
  *         (A + _graft_pbin = ⌊p/W⌋)
  *           ⋈[_graft_pbin = _graft_bin ∧ p ≥ lo ∧ p ≤ hi ∧ rest]
  *         (B + Generate(explode(sequence(⌊lo/W⌋, ⌊hi/W⌋)))))
  *
  * The original condition is kept verbatim as the residual, so results are
  * bit-identical; the added bin equality gives the planner a hash key, so
  * the join shuffles on the bin instead of broadcasting a whole side. A
  * point lives in exactly one bin → no bin-induced duplicates, no distinct.
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth` (a positive long in the
  * unit of the compared columns, e.g. epoch micros; pick ≈ the typical
  * interval width). Unset/0 ⇒ the rule is a strict no-op. Injected by
  * `GraftExtensions` into the operator-optimization batch (fixed point —
  * the rewrite is self-stabilizing: the rewritten join HAS a cross-side
  * equality, which disqualifies it from matching again).
  *
  * Scope guards (each preserves exactness, not just performance):
  *  - any cross-side `=`/`<=>` conjunct ⇒ no-op (Spark already hash-joins);
  *  - bounded expr and both bounds must be int/long or TIMESTAMP
  *    (timestamps bin on epoch micros, so `binWidth` is micros there)
  *    and each entirely from one join side;
  *  - outer joins only when the PRESERVED side is the point side — the
  *    replicated (Generate) side must not be the side whose unmatched rows
  *    are re-emitted, or each unmatched interval would surface once per
  *    bin; full-outer and existence joins are never rewritten;
  *  - non-deterministic conditions are never rewritten.
  *
  * Interval rows with hi < lo (or a null bound) explode to ZERO bins via
  * the `If` guard — Spark's `sequence` would otherwise DESCEND or throw —
  * matching the naive join, where such a row satisfies no containment.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.rangeJoin.binWidth"

  private def integral(t: DataType): Boolean =
    t == LongType || t == IntegerType || t == TimestampType

  /** Normalize a bound to int64: timestamps become epoch MICROS (so
    * `binWidth` is micros for timestamp joins — the natural SQL
    * spelling `p.ts BETWEEN v.ts AND v.ts + INTERVAL …` rewrites
    * without the query author converting anything), ints widen. */
  private def toLong(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case LongType      => e
    case _             => Cast(e, LongType)
  }

  /** Exact floor division as a codegen'd static call — `Divide` on
    * doubles loses exactness past 2^53 and integer `div` truncates
    * toward zero for negatives. */
  private def floorDivL(e: Expression, w: Long): Expression =
    StaticInvoke(classOf[java.lang.Math], LongType, "floorDiv",
      Seq(toLong(e), Literal(w)), Seq(LongType, LongType))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w =
      try conf.getConfString(ConfKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (w <= 0) plan
    else plan.transformUp {
      case j: Join => rewrite(j, w).getOrElse(j)
    }
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = j match {
    case Join(left, right, jt, Some(cond), hint) if cond.deterministic =>
      val conjs = splitConjunctivePredicates(cond)
      def leftOnly(e: Expression) =
        e.references.nonEmpty && e.references.subsetOf(left.outputSet)
      def rightOnly(e: Expression) =
        e.references.nonEmpty && e.references.subsetOf(right.outputSet)
      def crossSide(a: Expression, b: Expression) =
        (leftOnly(a) && rightOnly(b)) || (rightOnly(a) && leftOnly(b))

      val hasEqui = conjs.exists {
        case EqualTo(a, b)       => crossSide(a, b)
        case EqualNullSafe(a, b) => crossSide(a, b)
        case _                   => false
      }
      if (hasEqui) return None

      // every cross-side comparison as a bound fact: (bounded, bound, isLower)
      val facts = conjs.flatMap {
        case GreaterThanOrEqual(a, b) if crossSide(a, b) =>
          Seq((a, b, true), (b, a, false))
        case GreaterThan(a, b) if crossSide(a, b) =>
          Seq((a, b, true), (b, a, false))
        case LessThanOrEqual(a, b) if crossSide(a, b) =>
          Seq((a, b, false), (b, a, true))
        case LessThan(a, b) if crossSide(a, b) =>
          Seq((a, b, false), (b, a, true))
        case _ => Nil
      }

      val found = facts.iterator
        .filter { case (p, _, _) => integral(p.dataType) }
        .map(_._1)
        .flatMap { p =>
          val pLeft = leftOnly(p)
          def opposite(e: Expression) =
            if (pLeft) rightOnly(e) else leftOnly(e)
          def bound(lower: Boolean) = facts.collectFirst {
            case (bp, b, isLo) if isLo == lower && bp.semanticEquals(p)
              && opposite(b) && integral(b.dataType) => b
          }
          for (lo <- bound(lower = true); hi <- bound(lower = false))
            yield (p, lo, hi, pLeft)
        }
        .find { case (_, _, _, pLeft) =>
          jt match {
            case Inner | Cross => true
            case LeftOuter     => pLeft
            case RightOuter    => !pLeft
            case _             => false
          }
        }

      found.map { case (p, lo, hi, pLeft) =>
        val pbin = Alias(floorDivL(p, w), "_graft_pbin")()
        val binAttr = AttributeReference("_graft_bin", LongType,
          nullable = false)()
        // raw-bound guard (not bin-level): a same-bin reversed interval
        // would pass a bin comparison and draw a bin it must not have —
        // harmless here (the residual original condition rejects it)
        // but wasteful; `sequence` with explicit step also THROWS on
        // reversed bounds, so the guard is load-bearing either way
        val bins = If(LessThanOrEqual(toLong(lo), toLong(hi)),
          Sequence(floorDivL(lo, w), floorDivL(hi, w), Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone)),
          Literal.create(Array.empty[Long], ArrayType(LongType, false)))
        val pointSide = if (pLeft) left else right
        val ivSide = if (pLeft) right else left
        val newPoint = Project(pointSide.output :+ pbin, pointSide)
        val newIv = Generate(Explode(bins), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(binAttr), child = ivSide)
        val newCond = And(EqualTo(pbin.toAttribute, binAttr), cond)
        val (nl, nr) = if (pLeft) (newPoint, newIv) else (newIv, newPoint)
        Project(j.output, Join(nl, nr, jt, Some(newCond), hint))
      }
    case _ => None
  }
}
