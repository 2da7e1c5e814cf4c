package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangeJoin's bin-replicated joins must return EXACTLY the naive
  * inequality-join rows (which Spark plans as BNLJ — fine at unit-test
  * scale, the thing the operator exists to avoid at 100 TB), including
  * pair-uniqueness (no bin-induced duplicates) and left-outer null rows.
  * Fixture edges covered: intervals spanning 1 and 2+ bins, points on
  * inclusive bounds, bin-boundary starts, empty-match points. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.operators.RangeJoin

  private def iv = {
    val s = spark
    import s.implicits._
    // (id, start, end): widths from 0 to 2.5 bins at W=10
    Seq((1L, 0L, 9L), (2L, 5L, 24L), (3L, 10L, 10L), (4L, 17L, 42L),
        (5L, 30L, 31L), (6L, 100L, 105L),
        (7L, 50L, 40L)) // reversed: matches nothing, explodes to 0 bins
      .toDF("i_id", "s", "e")
  }
  private def pts = {
    val s = spark
    import s.implicits._
    Seq((10L, 0L), (11L, 9L), (12L, 10L), (13L, 24L), (14L, 25L),
        (15L, 31L), (16L, 55L), (17L, 99L), (18L, 105L))
      .toDF("p_id", "p")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("binnedPointJoin inner == naive inequality join, no duplicates") {
    val naive = pts.join(iv, col("p") >= col("s") && col("p") <= col("e"))
    for (w <- Seq(1L, 3L, 10L, 100L)) {
      val binned = RangeJoin.binnedPointJoin(pts, "p", iv, "s", "e", w)
      assert(rows(binned.select("p_id", "i_id")) ===
        rows(naive.select("p_id", "i_id")), s"binWidth=$w")
    }
  }

  test("binnedPointJoin left keeps unmatched points with null interval side") {
    val naive = pts.join(iv,
      col("p") >= col("s") && col("p") <= col("e"), "left")
    val binned = RangeJoin.binnedPointJoin(pts, "p", iv, "s", "e", 10L, "left")
    assert(rows(binned.select("p_id", "i_id")) ===
      rows(naive.select("p_id", "i_id")))
    // the fixture genuinely exercises the null branch
    assert(binned.filter(col("i_id").isNull).count() > 0)
  }

  test("binnedOverlapJoin == naive overlap join, each pair exactly once") {
    val b = iv.select(col("i_id").as("j_id"), col("s").as("s2"),
      col("e").as("e2"))
    val naive = iv.join(b, col("s") <= col("e2") && col("s2") <= col("e"))
    for (w <- Seq(1L, 7L, 10L, 1000L)) {
      val binned = RangeJoin.binnedOverlapJoin(iv, "s", "e", b, "s2", "e2", w)
      assert(rows(binned.select("i_id", "j_id")) ===
        rows(naive.select("i_id", "j_id")), s"binWidth=$w")
    }
  }
}
