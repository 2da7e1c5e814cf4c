package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property pin for the bin-replicated range joins: on randomized
  * interval/point sets — clustered and dispersed regimes, degenerate
  * (reversed, zero-width) intervals, boundary-aligned points — the
  * binned joins must return EXACTLY the rows an in-memory O(n·m)
  * reference computes, for bin widths far below, near, and far above
  * the interval lengths. Guards the single-bin-per-point and
  * first-common-bin pair-uniqueness arguments beyond RangeJoinSpec's
  * fixed fixture. */
class RangeJoinPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def genIntervals(rnd: Random, n: Int, span: Long): Seq[(Long, Long, Long)] =
    (1 to n).map { i =>
      val s = rnd.nextLong(span)
      val len = rnd.nextInt(5) match {
        case 0 => 0L                       // zero-width
        case 1 => -(rnd.nextLong(20) + 1)  // reversed: matches nothing
        case _ => rnd.nextLong(span / 4 + 1)
      }
      (i.toLong, s, s + len)
    }

  test("binnedPointJoin == in-memory reference on randomized inputs") {
    val s = spark
    import s.implicits._
    val rnd = new Random(20260813L)
    for (trial <- 1 to 4) {
      val span = if (trial % 2 == 0) 100L else 100000L // clustered vs dispersed
      val iv = genIntervals(rnd, 60, span)
      val pts = (1 to 80).map { i =>
        // half random, half pinned to interval endpoints (inclusive bounds)
        val v = if (i % 2 == 0) rnd.nextLong(span + span / 4)
        else { val (_, a, b) = iv(rnd.nextInt(iv.size)); if (i % 4 == 1) a else b }
        (1000L + i, v)
      }
      val expected = (for {
        (pid, p) <- pts; (iid, lo, hi) <- iv
        if p >= lo && p <= hi
      } yield (pid, iid)).sorted
      val ivDf = iv.toDF("i_id", "s", "e")
      val ptDf = pts.toDF("p_id", "p")
      for (w <- Seq(1L, 7L, span / 8 + 1, span * 2)) {
        val got = RangeJoin.binnedPointJoin(ptDf, "p", ivDf, "s", "e", w)
          .select("p_id", "i_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got === expected, s"trial=$trial binWidth=$w")
      }
    }
  }

  test("binnedOverlapJoin == in-memory reference on randomized inputs") {
    val s = spark
    import s.implicits._
    val rnd = new Random(4242L)
    for (trial <- 1 to 3) {
      val span = 3000L
      val a = genIntervals(rnd, 50, span)
      val b = genIntervals(rnd, 50, span).map { case (i, s0, e0) => (100L + i, s0, e0) }
      val expected = (for {
        (ai, as_, ae) <- a; (bi, bs, be) <- b
        if as_ <= be && bs <= ae && as_ <= ae && bs <= be
      } yield (ai, bi)).sorted
      val aDf = a.toDF("a_id", "a_s", "a_e")
      val bDf = b.toDF("b_id", "b_s", "b_e")
      for (w <- Seq(3L, 101L, 5000L)) {
        val got = RangeJoin.binnedOverlapJoin(aDf, "a_s", "a_e", bDf, "b_s", "b_e", w)
          .select("a_id", "b_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        assert(got === expected, s"trial=$trial binWidth=$w")
      }
    }
  }
}
