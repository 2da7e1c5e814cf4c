package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the step that
  * turns near-duplicate PAIRS (q28/qd1–qd4 output) into duplicate
  * CLUSTERS, so a cleaning pipeline can keep exactly one document per
  * group instead of dropping the `b` side of every pair (which
  * over-deletes on chains: a–b, b–c drops both b and c even though a–c
  * may not be near-dups).
  *
  * Algorithm: iterative min-label propagation to a fixpoint — every
  * node's label becomes the minimum label among itself and its
  * neighbors, repeated until no label changes. Exact and deterministic
  * (the result is the component-wide minimum id regardless of
  * iteration order); converges in O(graph diameter) rounds, each round
  * one equi-join + one partial-aggregatable groupBy (both shuffle on
  * the node key — no driver-side graph state, no collect). Duplicate
  * clusters are overwhelmingly tiny (diameter 1–3), so the loop runs
  * 2–4 rounds in practice; `localCheckpoint` truncates the growing
  * lineage each round so the plan stays O(1) deep. For adversarially
  * long chains at 100 TB the classic refinement is large-star/
  * small-star (alternating pointer-doubling, O(log n) rounds) — the
  * per-round plan shape here is the same building block.
  *
  * Output: (node, grp) for every node that appears in `pairs`, where
  * grp = min node id of the component.
  */
object DupGroups {

  def components(pairs: DataFrame): DataFrame = {
    // symmetrized edge list, materialized once: every round re-reads it
    val sym = pairs.select(col("a").as("x"), col("b").as("y"))
      .union(pairs.select(col("b").as("x"), col("a").as("y")))
      .localCheckpoint()
    // first round folded into the init: label = min(self, neighbors)
    var labels = sym.groupBy(col("x").as("node"))
      .agg(min(col("y")).as("mn"))
      .select(col("node"), least(col("node"), col("mn")).as("lbl"))
      .localCheckpoint()
    var converged = false
    while (!converged) {
      // propagate: each node takes the min over its neighbors' labels
      val nbrMin = sym
        .join(labels.select(col("node").as("y"), col("lbl").as("ylbl")), Seq("y"))
        .groupBy(col("x").as("node"))
        .agg(min(col("ylbl")).as("nlbl"))
      val next = labels.join(nbrMin, Seq("node"))
        .select(col("node"), least(col("lbl"), col("nlbl")).as("lbl"))
        .localCheckpoint()
      converged = next.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.lbl") =!= col("o.lbl"))
        .isEmpty
      labels = next
    }
    labels.select(col("node"), col("lbl").as("grp"))
  }
}
