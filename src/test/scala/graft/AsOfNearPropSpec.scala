package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.operators.AsOfJoin
import graft.queries.Relational

/** Property pins for the two round-10 reusable transforms beyond their
  * fixed-fixture gates:
  *
  *  - AsOfJoin.bothSides: on randomized probe/reference sets — shared
  *    and probe-only keys, duplicate timestamps, references exactly AT
  *    probe instants — the backward pick must equal max(ref ≤ t), the
  *    forward pick min(ref > t), per key (the `<=`/`>` complement that
  *    makes the nearest combine exact).
  *
  *  - Relational.bhStepUp: on randomized rational p-value lists the
  *    reject set must equal the literal Benjamini–Hochberg definition
  *    — k = max{ i : p_(i) ≤ α·i/m } computed by brute force over the
  *    sorted list, reject = rank ≤ k — including runs where interior
  *    ranks fail their own inequality and all-pass / all-fail runs.
  */
class AsOfNearPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bothSides == brute-force backward/forward picks on random data") {
    val s = spark
    import s.implicits._
    val rnd = new Random(20260816L)
    for (trial <- 1 to 3) {
      val nKeys = 6
      val probes = (1 to 120).map { i =>
        (i.toLong, (rnd.nextInt(nKeys) + 1).toLong, rnd.nextLong(1000L))
      }
      // references: random, plus some pinned exactly AT probe instants
      // (the <= boundary), plus one key with no references at all
      val refs0 = (1 to 90).map { _ =>
        ((rnd.nextInt(nKeys - 1) + 1).toLong, rnd.nextLong(1000L))
      }
      val pinned = probes.take(10).map { case (_, k, t) => (k, t) }
        .filter(_._1 != nKeys.toLong)
      val refs = refs0 ++ pinned
      val left = probes.toDF("event_id", "k", "t")
      val right = refs.toDF("k", "rt")
      val got = AsOfJoin.bothSides(left, right, "k", "t", "rt", "b", "f")
        .select("event_id", "b", "f")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
          .sortBy(_._1)
      val byKey = refs.groupBy(_._1)
      val want = probes.sortBy(_._1).map { case (id, k, t) =>
        val rs = byKey.getOrElse(k, Seq.empty).map(_._2)
        (id, rs.filter(_ <= t).sorted.lastOption,
          rs.filter(_ > t).sorted.headOption)
      }
      assert(got.map(g => g._1) === want.map(_._1))
      assert(got === want, s"trial $trial diverged")
      // boundary arms genuinely exercised
      assert(want.exists(w => w._2.isDefined && w._3.isDefined))
      assert(want.exists(_._2.isEmpty) || want.exists(_._3.isEmpty))
    }
  }

  test("bhStepUp == the literal BH definition on random rationals") {
    val s = spark
    import s.implicits._
    val rnd = new Random(977L)
    for (trial <- 1 to 5) {
      val m = 20 + rnd.nextInt(30)
      val tests = (1 to m).map { i =>
        val den = 50L + rnd.nextInt(950).toLong
        // mix tiny and large p so some trials reject a prefix, some none
        val num = if (rnd.nextBoolean()) rnd.nextLong(den / 25 + 1) + 1
          else rnd.nextLong(den) + 1
        (s"t$i", num, den)
      }
      val df = tests.toDF("tid", "p_num", "p_den")
      val got = Relational.bhStepUp(df, Seq("tid"))
        .select("tid", "rnk", "reject").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
      // brute force: sort by (double p, tid), k = max passing rank
      val ranked = tests.sortBy { case (tid, n, d) =>
        (n.toDouble / d, tid) }.zipWithIndex
        .map { case ((tid, n, d), i) => (tid, n, d, i + 1L) }
      val k = ranked.filter { case (_, n, d, r) =>
        20L * n * m <= r * d }.map(_._4).maxOption.getOrElse(0L)
      val want = ranked.map { case (tid, _, _, r) => (tid, r, r <= k) }
      assert(got.sortBy(_._2) === want, s"trial $trial diverged (k=$k)")
    }
  }
}
