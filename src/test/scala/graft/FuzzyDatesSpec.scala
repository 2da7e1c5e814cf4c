package graft

import graft.geo.FuzzyDates
import org.scalatest.funsuite.AnyFunSuite

class FuzzyDatesSpec extends AnyFunSuite {
  private val day = 86400000L

  test("year denotes Jan 1 .. Dec 31") {
    assert(FuzzyDates.minMs("1970") === Some(0L))
    assert(FuzzyDates.maxMs("1970") === Some(364L * day))
    assert(FuzzyDates.maxMs("1972") === Some(FuzzyDates.minMs("1972").get + 365L * day)) // leap
  }

  test("year-month denotes first .. last day of month") {
    assert(FuzzyDates.minMs("1970-02") === Some(31L * day))
    assert(FuzzyDates.maxMs("1970-02") === Some((31L + 27L) * day))
  }

  test("full date denotes itself") {
    assert(FuzzyDates.minMs("1970-01-02") === Some(day))
    assert(FuzzyDates.maxMs("1970-01-02") === Some(day))
  }

  test("unparseable → None (N4 NaN semantics)") {
    for (s <- Seq(null, "", "18??", "unknown", "1860-13", "1860-00", "1860-02-30", "186"))
      assert(FuzzyDates.minMs(s).isEmpty && FuzzyDates.maxMs(s).isEmpty, s"for '$s'")
  }

  test("threshold is the ms-based 15-year constant (N3)") {
    assert(FuzzyDates.ThresholdMs === 473040000000L)
    assert(FuzzyDates.ThresholdMs === 5475L * day)
  }

  test("property: min <= max for all parseable dates (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val y = 1800 + rnd.nextInt(301)
      val m = 1 + rnd.nextInt(12)
      val d = 1 + rnd.nextInt(28)
      val s = rnd.nextInt(3) match {
        case 0 => f"$y"
        case 1 => f"$y-$m%02d"
        case _ => f"$y-$m%02d-$d%02d"
      }
      val (mn, mx) = (FuzzyDates.minMs(s), FuzzyDates.maxMs(s))
      assert(mn.isDefined && mx.isDefined && mn.get <= mx.get, s"for '$s'")
    }
  }
}
