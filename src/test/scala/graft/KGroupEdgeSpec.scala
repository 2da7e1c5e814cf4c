package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Relational

/** Edge-case pins for the round-10 K-group read paths, on SYNTHETIC
  * userCents/dayCents relations (the shared-read-path contract makes
  * these directly drivable): the guards must degrade to NULL
  * statistics — never to exceptions, wrong audit sums, or spurious
  * numbers — because a streaming monitor (s37/s38) will inevitably
  * read them mid-fill when some arm is still empty. */
class KGroupEdgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def uc(rows: Seq[(String, Long, Long)]) = {
    val s = spark; import s.implicits._
    rows.toDF("event_type", "user_id", "cents")
  }

  test("anovaStats: an under-filled arm yields NULL F, exact sums") {
    // users 0,4 -> arm 0 (n=2); users 1,5 -> arm 1; users 2,6 -> arm 2;
    // user 3 alone -> arm 3 under-filled (n=1 < 2)
    val rows = (0L to 6L).map(u => ("t", u, (u + 1) * 1000L))
    val got = Relational.anovaStats(uc(rows)).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 7L)                 // n
    assert(r.getLong(11) == 1L)                // n3 under-filled
    assert(r.isNullAt(14), "F must be NULL with an n<2 arm")
    // audit sums still exact: arm0 = users 0,4 -> v = 1,5
    assert(r.getLong(3) == 6L && r.getLong(4) == 26L) // s0, q0
  }

  test("anovaStats: zero within-group variance yields NULL F") {
    // every arm has 2 users, all with the SAME v -> ssw = 0
    val rows = (0L to 7L).map(u => ("t", u, 42000L))
    val got = Relational.anovaStats(uc(rows)).collect()
    assert(got.length == 1 && got.head.isNullAt(14))
  }

  test("anovaStats: identical arm means -> F = 0 exactly") {
    // arms all see v = {10, 20}: ssb = 0, ssw > 0 -> F = 0.0
    val rows = (0L to 7L).map(u =>
      ("t", u, if (u < 4) 10000L else 20000L))
    val got = Relational.anovaStats(uc(rows)).collect()
    assert(got.length == 1 && !got.head.isNullAt(14)
      && got.head.getDouble(14) == 0.0)
  }

  test("fdrScreen: single day per type -> every p = 1, nothing rejected") {
    val s = spark; import s.implicits._
    val dc = Seq(("a", "2024-01-01", 5000L), ("b", "2024-01-01", 9000L))
      .toDF("event_type", "day", "cents")
      .withColumn("day", col("day").cast("date"))
    val got = Relational.fdrScreen(dc).collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getLong(3) == 1L && r.getLong(4) == 1L) // p_num = p_den = 1
      assert(!r.getBoolean(7), "p = 1 tests must never be rejected")
    }
    // ranks are still a total order
    assert(got.map(_.getLong(6)).sorted.toSeq == Seq(1L, 2L))
  }

  test("bhStepUp: all-tiny p rejects everything, all-huge rejects nothing") {
    val s = spark; import s.implicits._
    val tiny = Seq(("a", 1L), ("b", 1L), ("c", 1L))
      .toDF("tid", "p_num").withColumn("p_den", lit(10000L))
    assert(Relational.bhStepUp(tiny, Seq("tid")).collect()
      .forall(_.getAs[Boolean]("reject")))
    val huge = Seq(("a", 9000L), ("b", 9500L), ("c", 9999L))
      .toDF("tid", "p_num").withColumn("p_den", lit(10000L))
    assert(Relational.bhStepUp(huge, Seq("tid")).collect()
      .forall(!_.getAs[Boolean]("reject")))
  }
}
