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
  * Algorithm: alternating **large-star / small-star** (the
  * pointer-doubling MapReduce CC formulation of Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — public
  * literature). Each round rewrites the edge set twice:
  *
  *  - large-star(u): every neighbor v > u re-attaches to
  *    m = min(Γ(u) ∪ {u}) — run from BOTH endpoints of every edge
  *    (symmetrized list), one groupBy(min) + one equi-join;
  *  - small-star(u): over min-oriented edges (u > v), every small
  *    neighbor AND u itself re-attach to m = min(Γ⁻(u) ∪ {u}).
  *
  * Both steps emit edges (child, parent) with parent < child, preserve
  * connectivity, and never raise a node's parent — the edge set
  * converges to one star per component rooted at the component MINIMUM,
  * in O(log n) rounds even on adversarial path graphs (each round at
  * least halves the depth of every attachment tree; plain min-label
  * propagation needs O(diameter) rounds on the same input). Exact and
  * deterministic; each half-step is one partial-aggregatable groupBy +
  * one equi-join, both shuffling on the node key — no driver-side graph
  * state, no collect. `localCheckpoint` truncates the growing lineage
  * each round so the plan stays O(1) deep, and the convergence test
  * (edge set unchanged) is
  * ONE signed-count aggregation over the two checkpointed sets —
  * round-14 job-count work: the count + except convergence pair cost
  * an extra scheduled action and an extra shuffle per round, pure
  * per-job floor on every pipeline that resolves clusters
  * (qc2/qc4/qc5/qd5/qd6/qd16/qx18).
  *
  * Output: (node, grp) for every node that appears in `pairs`, where
  * grp = min node id of the component.
  */
object DupGroups {

  def components(pairs: DataFrame): DataFrame = componentsWithRounds(pairs)._1

  /** `components` plus the number of large+small-star rounds executed —
    * exposed so tests can pin the O(log n) convergence bound. */
  def componentsWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    // canonical min-oriented edge list (hi, lo), deduped once up front.
    // Cached (lazily) BEFORE the self-pair split so the (possibly
    // expensive) `pairs` lineage — e.g. an LSH candidate join — is
    // computed exactly once even though two branches read it: the first
    // round's checkpoint action populates the cache, the final
    // selfSingletons branch reads it. A lazy OpCaches.track instead of
    // an eager localCheckpoint saves one scheduled job per invocation
    // (the blocks land during work that runs anyway).
    // DETERMINISM REQUIREMENT (round-15 advisory pin): unlike the old
    // localCheckpoint, a cache can be EVICTED under memory pressure and
    // silently recomputed from lineage — correctness of selfSingletons
    // then relies on the recomputed `pairs` reproducing the identical
    // row set. Every in-repo caller's pair lineage is deterministic
    // (hash-banded candidate joins + exact verifies over parquet
    // inputs; no rand(), no sampling). A caller with a nondeterministic
    // pair source must localCheckpoint its pairs before calling in.
    val canon = OpCaches.track(pairs
      .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v")))
    var edges = canon
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged) {
      // ---- large-star: from each endpoint, larger neighbors hop to the
      // neighborhood minimum. sym carries every edge in both directions
      // so m(u) = least(u, min neighbor) is one groupBy.
      val sym = edges.select(col("u").as("x"), col("v").as("y"))
        .union(edges.select(col("v").as("x"), col("u").as("y")))
      val mins = sym.groupBy("x")
        .agg(least(col("x"), min(col("y"))).as("m"))
      // EAGER checkpoint, deliberately: a lazy persist was A/B-measured
      // 1.5–2.6× WORSE here (qx18 2.0 → 4.6 s, qd6 2.5 → 3.5 s) — AQE
      // submits the two small-star consumers' stages concurrently, and
      // both compute the uncached large-star subtree before either has
      // populated the cache (the populate race doubles the round's
      // heaviest work). The scheduled job is cheaper than the race.
      val large = sym.join(mins, Seq("x"))
        .filter(col("y") > col("x") && col("y") =!= col("m"))
        .select(col("y").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint()
      // ---- small-star: edges are already min-oriented (u > v); every
      // small neighbor and u itself re-attach to the smallest neighbor.
      val smins = large.groupBy("u").agg(min(col("v")).as("m"))
      val next = large.join(smins, Seq("u"))
        .select(col("v").as("c"), col("m"))
        .filter(col("c") =!= col("m"))
        .select(col("c").as("u"), col("m").as("v"))
        .union(smins.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint()
      rounds += 1
      // set equality in ONE job: both sides are distinct sets, so they
      // are identical iff no (u, v) appears on exactly one side — the
      // signed tagged-union count (q74's single-pass multiset mismatch,
      // degenerated to sets) over the two checkpointed relations
      // replaces the count-pair + except(anti-join) convergence probe
      converged = next.select(col("u"), col("v"), lit(1L).as("w"))
        .union(edges.select(col("u"), col("v"), lit(-1L).as("w")))
        .groupBy("u", "v").agg(sum(col("w")).as("s"))
        .filter(col("s") =!= 0L)
        .isEmpty
      edges = next
    }
    // fixpoint = stars (child, root=min); roots label themselves
    val starred = edges.select(col("u").as("node"), col("v").as("grp"))
      .union(edges.select(col("v").as("node"), col("v").as("grp")).distinct())
    // a node seen ONLY as a self-pair (a, a) was dropped by the
    // canonicalizing u =!= v filter; restore it as its own singleton
    // component so the contract "a row for every node in `pairs`"
    // holds (anti-join keeps nodes that also touch real edges unique)
    val selfSingletons = canon.filter(col("u") === col("v"))
      .select(col("u").as("node")).distinct()
      .join(starred, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("grp"))
    (starred.union(selfSingletons), rounds)
  }
}
