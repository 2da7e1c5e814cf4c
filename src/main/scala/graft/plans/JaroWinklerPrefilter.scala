package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Cast, Expression,
  GreaterThan, GreaterThanOrEqual, Literal, Multiply, OctetLength,
  PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: derive a cheap, PROVABLY SOUND length prefilter from
  * a Jaro-Winkler threshold predicate (qd14's plan-level half).
  *
  * For byte lengths l₁ ≤ l₂, matches m ≤ l₁ bound the score:
  *   jaro ≤ (m/l₁ + m/l₂ + 1)/3 ≤ (2 + l₁/l₂)/3
  * and the Winkler boost is at most +0.4·(1−jaro), so
  *   jw ≥ τ  ⟹  jaro ≥ (τ − 0.4)/0.6  ⟹  l₁/l₂ ≥ 5τ − 4.
  * Hence `jaro_winkler(a, b) >= τ` (τ > 0.8) implies BOTH
  * `octet_length(a) ≥ r·octet_length(b)` and the converse, with
  * r = 5τ − 4. The injected conjuncts are codegen-trivial integer/
  * double comparisons that run BEFORE the O(l₁·l₂) matching kernel —
  * on the documents corpus they discharge ~41% of blocked candidate
  * pairs without touching a byte of either string — and, unlike the
  * kernel, they are pushable/reorderable by every downstream rule.
  *
  * Soundness margin: r is computed in floating point, so 1e-9 is
  * subtracted — the filter can only be SLIGHTLY more permissive than
  * the exact bound, never stricter, so no qualifying pair is ever
  * dropped (the qd14 oracle hash-match proves it end-to-end; the
  * derivation is replayed as a property test in JaroWinklerSpec).
  *
  * Self-stabilizing in the fixed-point batch (the BinnedRangeJoinRule
  * requirement): bounds already present (semanticEquals) are not
  * re-added, so a second application is a no-op. Only TOP-LEVEL
  * conjuncts are strengthened — a jw predicate under an OR implies
  * nothing globally.
  */
object JaroWinklerPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def bounds(jw: JaroWinklerSim, tau: Double): Seq[Expression] = {
    val r = 5.0 * tau - 4.0 - 1e-9
    if (r <= 0.0) Nil
    else Seq(
      GreaterThanOrEqual(Cast(OctetLength(jw.left), DoubleType),
        Multiply(Literal(r), Cast(OctetLength(jw.right), DoubleType))),
      GreaterThanOrEqual(Cast(OctetLength(jw.right), DoubleType),
        Multiply(Literal(r), Cast(OctetLength(jw.left), DoubleType))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.flatMap {
        case GreaterThanOrEqual(jw: JaroWinklerSim, Literal(t: Double, DoubleType)) =>
          bounds(jw, t)
        case GreaterThan(jw: JaroWinklerSim, Literal(t: Double, DoubleType)) =>
          bounds(jw, t)
        case _ => Nil
      }.filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (extra.isEmpty) f
      else Filter((extra ++ conjuncts).reduce(And), child)
  }
}
