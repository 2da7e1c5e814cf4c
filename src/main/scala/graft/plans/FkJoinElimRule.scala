package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: FOREIGN-KEY JOIN ELIMINATION — the classic
  * semantic-optimizer rewrite relational engines apply under declared
  * constraints (and Spark itself cannot, having no constraint
  * catalog): an INNER equi-join to a dimension whose columns are never
  * read above the join is the identity on the fact side, PROVIDED the
  * join key pair is a declared foreign key — every non-null fk value
  * matches EXACTLY ONE pk row (referential integrity + pk uniqueness):
  *
  *   π_{facts}(F ⋈[fk = pk] D)  ⇒  π_{facts}(σ_{fk IS NOT NULL}(F))
  *
  * The IsNotNull filter is kept for exactness under nullable fk
  * columns (an inner join drops null-fk rows; the declaration says
  * nothing about nulls). The payoff at 100 TB: BI tools and generated
  * semantic layers join every dimension in the model whether the query
  * reads it or not — eliminating the join removes a whole shuffle or
  * broadcast of the dimension per query, by PLAN, not by data.
  *
  * Opt-in via `spark.graft.joinElim.constraints`: comma-separated
  * `fkCol=pkCol` column-name pairs (e.g. "l_orderkey=o_orderkey").
  * Declaring a pair asserts the constraint; the rule's soundness rests
  * on that declaration (exactly like a database FK DDL), and the q126
  * oracle replays the JOIN form so the hash match proves the
  * elimination lossless on the data. Unset ⇒ strict no-op.
  *
  * Scope guards (each preserves exactness):
  *  - INNER joins only, condition EXACTLY one attr=attr equality — any
  *    extra conjunct could filter fact rows through the dim side;
  *  - every attribute referenced above the join must come from the fk
  *    side (the dim side must be column-dead);
  *  - the dim subtree must be PURE — attribute-only Projects /
  *    SubqueryAlias over a leaf relation; a Filter, Aggregate, or
  *    nested Join on the dim side could change multiplicity or drop
  *    matches, so any non-pure shape disqualifies;
  *  - name-pair matching is exact and directional (fk side must carry
  *    the declared fk NAME, pk side the pk name).
  *
  * Self-stabilizing in the fixed-point batch: the rewrite leaves no
  * Join behind. Injected by `GraftExtensions` (sixth graft rule).
  */
object FkJoinElimRule extends Rule[LogicalPlan] {
  val ConfKey = "spark.graft.joinElim.constraints"

  private def declared: Set[(String, String)] =
    conf.getConfString(ConfKey, "").split(",").iterator
      .map(_.trim).filter(_.nonEmpty)
      .map(_.split("=", 2)).collect {
        case Array(f, p) => (f.trim, p.trim)
      }.toSet

  /** The dim side must add nothing and remove nothing: attribute-only
    * projections over a single leaf relation. */
  private def pureRelation(p: LogicalPlan): Boolean = p match {
    case Project(pl, child) =>
      pl.forall(_.isInstanceOf[AttributeReference]) && pureRelation(child)
    case SubqueryAlias(_, child) => pureRelation(child)
    case _: LeafNode => true
    case _ => false
  }

  /** If `j` is an eliminable FK join w.r.t. `refs` (the attributes the
    * parent actually reads), return the fk-side replacement. */
  private def elim(j: Join, refs: AttributeSet,
                   pairs: Set[(String, String)]): Option[LogicalPlan] =
    j match {
      case Join(l, r, Inner, Some(EqualTo(x: AttributeReference,
          y: AttributeReference)), _) =>
        val sides = Seq(
          (x, l, y, r), // x from left, y from right
          (y, l, x, r)  // y from left, x from right
        ).collectFirst {
          case (a, fkSide, b, pkSide)
            if fkSide.outputSet.contains(a) && pkSide.outputSet.contains(b)
              && refs.subsetOf(fkSide.outputSet)
              && pairs.contains((a.name, b.name))
              && pureRelation(pkSide) =>
            Filter(IsNotNull(a), fkSide)
        }
        sides
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val pairs = declared
    if (pairs.isEmpty) plan
    else plan.transformUp {
      case p @ Project(plist, j: Join) =>
        elim(j, AttributeSet(plist.flatMap(_.references)), pairs)
          .map(c => p.copy(child = c)).getOrElse(p)
      case a @ Aggregate(gs, aggs, j: Join, _) =>
        elim(j, AttributeSet((gs ++ aggs).flatMap(_.references)), pairs)
          .map(c => a.copy(child = c)).getOrElse(a)
    }
  }
}
