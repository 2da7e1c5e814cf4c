package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force oracles for the two distribution-test queries (q128 KS,
  * q129 chi-square): recompute both statistics driver-side from the raw
  * sf0.001 parquet with plain Scala collections and require the
  * distributed plans to reproduce them exactly (the integer audit
  * columns bit-for-bit, the rounded doubles to the declared 1e-6 grid).
  * Also pins q128's documented data precondition — every per-user
  * binned sum is nonnegative. (Both engines' integer division
  * truncates toward zero — measured, see the q132 note — so the
  * precondition exists to keep truncation equal to the FLOOR the bin
  * semantics intend, not to bridge an engine divergence.) */
class StatsTestsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q128 KS statistic matches a driver-side brute force") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "user_id", "value")
      .collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    val perUser = rows.groupBy(r => (r._1, r._2)).map { case ((et, uid), g) =>
      val s = g.map(r => math.floor(r._3 * 100).toLong).sum
      assert(s >= 0L, s"per-user binned sum went negative for ($et,$uid)")
      (et, s / 1000L, uid % 2L)
    }.toSeq

    val expected = perUser.groupBy(_._1).map { case (et, obs) =>
      val n0 = obs.count(_._3 == 0L).toLong
      val n1 = obs.count(_._3 == 1L).toLong
      val vs = obs.map(_._2).distinct.sorted
      var c0 = 0L; var c1 = 0L; var dNum = 0L
      vs.foreach { v =>
        c0 += obs.count(o => o._2 == v && o._3 == 0L)
        c1 += obs.count(o => o._2 == v && o._3 == 1L)
        dNum = math.max(dNum, math.abs(c0 * n1 - c1 * n0))
      }
      et -> ((n0, n1, dNum))
    }

    val got = SparkEntry.queries("q128_kstest")(spark, TestSpark.Sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n0, n1, dNum) = expected(r.getString(0))
      assert(r.getLong(1) == n0 && r.getLong(2) == n1,
        s"${r.getString(0)}: arm sizes ${r.getLong(1)}/${r.getLong(2)} != $n0/$n1")
      assert(r.getLong(3) == dNum,
        s"${r.getString(0)}: d_num ${r.getLong(3)} != $dNum")
      val d = dNum.toDouble / (n0.toDouble * n1)
      assert(math.abs(r.getDouble(4) - d) <= 5e-7)
      val lambda = d * math.sqrt(n0.toDouble * n1 / (n0 + n1).toDouble)
      assert(math.abs(r.getDouble(5) - lambda) <= 5e-7)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q129 chi-square matches a driver-side brute force") {
    val cells = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .select("o_orderpriority", "o_orderstatus")
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }

    val rt = cells.groupBy(_._1._1).map { case (p, g) => p -> g.values.sum }
    val ct = cells.groupBy(_._1._2).map { case (s, g) => s -> g.values.sum }
    val nn = cells.values.sum
    val contribs = cells.map { case ((p, s), n) =>
      val dev = nn * n - rt(p) * ct(s)
      val c6 = math.floor(
        dev.toDouble * dev / (nn.toDouble * rt(p) * ct(s)) * 1e6 + 0.5).toLong
      ((p, s), (n, rt(p), ct(s), dev, c6))
    }
    // deviations over any row of the contingency table sum to zero
    contribs.keys.map(_._1).toSeq.distinct.foreach { p =>
      assert(contribs.collect { case ((pp, _), v) if pp == p => v._4 }.sum == 0L)
    }
    val chi2 = contribs.values.map(_._5).sum.toDouble / 1e6

    val got = SparkEntry.queries("q129_chisq")(spark, TestSpark.Sf).collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      val (n, rtv, ctv, dev, c6) = contribs((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n && r.getLong(3) == rtv && r.getLong(4) == ctv)
      assert(r.getLong(5) == dev, s"dev mismatch at ${(r.getString(0), r.getString(1))}")
      assert(r.getLong(6) == c6)
      assert(r.getDouble(7) == chi2)
    }
  }
}
