package graft

import graft.operators.DupGroups
import org.scalatest.funsuite.AnyFunSuite

class DupGroupsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cc(edges: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    DupGroups.components(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, star, cycle, and disjoint components resolve to min ids") {
    // chain 1-2-3-4 (diameter 3: exercises >1 propagation round),
    // star 10-{11,12,13}, cycle 20-21-22-20, isolated pair 30-31
    val got = cc((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L))
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L,
      30L -> 30L, 31L -> 30L)
    assert(got === expected)
  }

  test("long chain converges (adversarial diameter)") {
    val edges = (1L until 40L).map(i => (i, i + 1))
    val got = cc(edges: _*)
    assert(got.size === 40)
    assert(got.values.toSet === Set(1L))
  }

  test("adversarial chain resolves in O(log n) rounds, not O(diameter)") {
    // path graph of 129 nodes (diameter 128): min-label propagation needs
    // ~128 rounds; the large-star/small-star alternation must stay
    // logarithmic. 12 ≈ 1.7·log2(128) is a generous cushion over the
    // observed count while still failing hard on any O(diameter) regress.
    import spark.implicits._
    val edges = (1L until 129L).map(i => (i, i + 1)).toDF("a", "b")
    val (comp, rounds) = DupGroups.componentsWithRounds(edges)
    val got = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 129)
    assert(got.values.toSet === Set(1L))
    assert(rounds <= 12, s"large-star/small-star took $rounds rounds")
  }

  test("self-pairs yield singleton components (scaladoc contract)") {
    // node 50 appears ONLY as a self-pair (50,50): it must still get a
    // row, as its own singleton component; node 5's self-pair must not
    // duplicate its real-component row
    val got = cc((5L, 6L), (5L, 5L), (50L, 50L))
    assert(got === Map(5L -> 5L, 6L -> 5L, 50L -> 50L))
  }

  test("self-pair-only input (no real edges) still labels every node") {
    val got = cc((7L, 7L), (9L, 9L))
    assert(got === Map(7L -> 7L, 9L -> 9L))
  }

  test("bridging edge merges two clusters through their min label") {
    // {5,6} and {7,8} joined by 6-7: everything labels to 5
    val got = cc((5L, 6L), (7L, 8L), (6L, 7L))
    assert(got === Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L))
  }

  test("random graph matches a union-find reference with bounded rounds") {
    // 2000 nodes, 2500 random edges (past the connectivity threshold in
    // places, fragmented in others — a mix of giant component, small
    // trees, and isolated pairs); reference = in-memory union-find with
    // path compression
    val rnd = new scala.util.Random(42)
    val n = 2000L
    val edges = Seq.fill(2500)((rnd.nextLong(n), rnd.nextLong(n)))
      .filter { case (a, b) => a != b }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v)).toMap
    import spark.implicits._
    val (comp, rounds) = DupGroups.componentsWithRounds(edges.toDF("a", "b"))
    val got = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(rounds <= 12, s"star alternation took $rounds rounds on the random graph")
  }
}
