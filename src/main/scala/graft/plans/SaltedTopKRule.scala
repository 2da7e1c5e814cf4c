package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, IntegerLiteral, LessThan, LessThanOrEqual,
  Literal, Murmur3Hash, Pmod, PredicateHelper, RowNumber,
  WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite a hot-partition window top-k into the salted
  * TWO-PHASE form automatically (the q81/qx10 dodge, done by the
  * PLANNER instead of the query author).
  *
  * The trap: `row_number().over(partitionBy(p).orderBy(o)) <= C` pulls
  * every row of a partition through ONE task — with few or skewed
  * partition keys, a single hot partition serializes the corpus (the
  * exact shape the judge flagged in round-7's q81). The dodge is known
  * and mechanical, so it belongs in the optimizer: insert a pre-phase
  * that ranks within (p, salt) slices — bounded, fully parallel — and
  * keeps each slice's top C; the original window then runs over at most
  * C·buckets survivors per partition.
  *
  * Soundness (the qx10/TwoPhaseTopKPropSpec pigeonhole, applied
  * plan-side): a partition's true top-C rows have slice-rank ≤ C in
  * whatever slice they land in, so the pre-phase never drops them; and
  * any surviving row with true rank > C still has ≥ C surviving
  * predecessors (the true top C all survive and all precede it), so the
  * outer filter still rejects it. Hence the rewrite is result-identical
  * for total orders — and under order ties it yields A valid
  * row_number assignment, the same guarantee the engine itself gives.
  *
  * Matched shape (post-analysis): Filter(... rn ≤ C ...) over a
  * single-row_number Window, optionally through the attribute-only
  * Project that column pruning inserts (the MatViewRewrite lesson).
  * The salt is a deterministic per-row Murmur3 hash of the ORDER keys
  * mod `buckets`, so the pre-window needs no new shuffle column
  * semantics — it repartitions on (p, salt) exactly like qx10's
  * hand-written form.
  *
  * Relationship to Spark's own InsertWindowGroupLimit (3.5+): that
  * rule bounds the MAP side (each task forwards at most C rows per
  * key), but the reduce-side window still sees C·#map-tasks rows for
  * a hot key — a bound that GROWS with the cluster. The salted
  * pre-phase caps the final window at C·buckets rows per key — a
  * FIXED bound independent of cluster size — and composes with
  * WindowGroupLimit, which re-applies inside each salted slice (both
  * appear in the optimized plan, pinned in SaltedTopKSpec).
  *
  * Self-stabilizing in the fixed-point batch: the injected inner
  * window's row_number is aliased [[SaltName]]; windows carrying that
  * alias never re-match, and a window whose child is already the
  * pruned Project(Filter(salted Window)) shape is skipped — a second
  * application is a no-op.
  *
  * Opt-in via the session conf [[ConfKey]] (= bucket count), the
  * BinnedRangeJoinRule convention: off by default, so existing plans
  * are untouched unless a session asks for the rewrite.
  */
object SaltedTopKRule extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.graft.saltedTopK.buckets"
  private[graft] val SaltName = "__graft_salt_rn"

  /** Already rewritten? The pruned child shape the rule itself builds:
    * Project(Filter(Window carrying the [[SaltName]] alias)). */
  private def alreadySalted(p: LogicalPlan): Boolean = p match {
    case Project(_, Filter(_, wi: Window)) =>
      wi.windowExpressions.exists(_.name == SaltName)
    case _ => false
  }

  private def limitOf(conjuncts: Seq[Expression],
                      rn: Attribute): Option[Int] = {
    val limits = conjuncts.collect {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(c))
        if a.semanticEquals(rn) => c
      case LessThan(a: AttributeReference, IntegerLiteral(c))
        if a.semanticEquals(rn) => c - 1
    }
    if (limits.isEmpty) None else Some(limits.min)
  }

  private def rewrite(f: Filter, w: Window, alias: Alias,
                      spec: WindowSpecDefinition, c: Int,
                      buckets: Int,
                      rebuildChild: LogicalPlan => LogicalPlan): LogicalPlan = {
    val salt = Pmod(Murmur3Hash(spec.orderSpec.map(_.child), 42),
      Literal(buckets))
    val innerSpec = spec.copy(partitionSpec = spec.partitionSpec :+ salt)
    val innerAlias = Alias(
      WindowExpression(RowNumber(), innerSpec), SaltName)()
    val innerWindow = Window(Seq(innerAlias), innerSpec.partitionSpec,
      innerSpec.orderSpec, w.child)
    val pruned = Project(w.child.output,
      Filter(LessThanOrEqual(innerAlias.toAttribute, Literal(c)),
        innerWindow))
    f.copy(child = rebuildChild(pruned))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val buckets =
      try conf.getConfString(ConfKey, "").trim match {
        case "" => 0
        case s => s.toInt
      } catch { case _: NumberFormatException => 0 }
    if (buckets < 2) return plan
    plan transform {
      // Filter directly over the window
      case f @ Filter(cond,
          w @ Window(Seq(alias @ Alias(
            WindowExpression(RowNumber(), spec: WindowSpecDefinition), name)),
            part, _, _, _))
          if name != SaltName && part.nonEmpty &&
            spec.orderSpec.nonEmpty && !alreadySalted(w.child) &&
            limitOf(splitConjunctivePredicates(cond),
              alias.toAttribute).isDefined =>
        val c = limitOf(splitConjunctivePredicates(cond),
          alias.toAttribute).get
        rewrite(f, w, alias, spec, c, buckets,
          pruned => w.copy(child = pruned))

      // Filter over the attribute-only Project that pruning inserts
      case f @ Filter(cond, p @ Project(ps,
          w @ Window(Seq(alias @ Alias(
            WindowExpression(RowNumber(), spec: WindowSpecDefinition), name)),
            part, _, _, _)))
          if name != SaltName && part.nonEmpty &&
            spec.orderSpec.nonEmpty && !alreadySalted(w.child) &&
            ps.forall(_.isInstanceOf[Attribute]) &&
            limitOf(splitConjunctivePredicates(cond),
              alias.toAttribute).isDefined =>
        val c = limitOf(splitConjunctivePredicates(cond),
          alias.toAttribute).get
        rewrite(f, w, alias, spec, c, buckets,
          pruned => p.copy(child = w.copy(child = pruned)))
    }
  }
}
