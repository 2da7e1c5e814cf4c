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

  test("ISO datetimes denote a precise instant (round-10 grammar)") {
    // 1970-01-02T03:04:05.678 = 1d + 3h 4m 5.678s, UTC
    val t = day + 3L * 3600000 + 4L * 60000 + 5678L
    assert(FuzzyDates.minMs("1970-01-02T03:04:05.678") === Some(t))
    assert(FuzzyDates.maxMs("1970-01-02T03:04:05.678") === Some(t))
    // optional Z, optional fraction, optional seconds
    assert(FuzzyDates.minMs("1970-01-02T03:04:05Z") === Some(t - 678L))
    assert(FuzzyDates.minMs("1970-01-02T03:04") === Some(t - 5678L))
    // short fractions are left-aligned (".2" = 200 ms, not 2 ms)
    assert(FuzzyDates.minMs("1970-01-02T00:00:00.2") === Some(day + 200L))
    assert(FuzzyDates.minMs("1970-01-02T00:00:00.25") === Some(day + 250L))
    // datetime min == max (an instant, not a period)
    for (s <- Seq("1861-03-04T12:30:00", "1875-09-01T06:00:00.500"))
      assert(FuzzyDates.minMs(s) === FuzzyDates.maxMs(s), s"for '$s'")
  }

  test("malformed datetimes → None") {
    for (s <- Seq("1970-01-02T24:00:00", "1970-01-02T03:60:00",
        "1970-01-02T03:04:60", "1970-02-30T01:02:03", "1970-01-02T0304",
        "1970-01-02T03:04:05.1234", "1970-01-02 03:04:05"))
      assert(FuzzyDates.minMs(s).isEmpty && FuzzyDates.maxMs(s).isEmpty, s"for '$s'")
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

  test("Date.parse residual forms: slash and month-name day precision") {
    // addresses.js:67-74 pipes fuzzy-dates output into new Date(s);
    // Space/Time dumps carry slash and English month-name dates, so
    // both parse to the same single-day period as their ISO spelling
    val iso = FuzzyDates.period("1861-03-04")
    for (v <- Seq("1861/03/04", "1861/3/4", "March 4, 1861", "Mar 4 1861",
                  "mar. 4, 1861", "4 March 1861", "4 Mar 1861"))
      assert(FuzzyDates.period(v) === iso, s"form: $v")
    assert(FuzzyDates.minMs("1861/03/04") === FuzzyDates.minMs("1861-03-04"))
    assert(FuzzyDates.maxMs("March 4, 1861") === FuzzyDates.maxMs("1861-03-04"))
    // invalid calendar days reject identically across spellings
    assert(FuzzyDates.period("1861/02/30").isEmpty)
    assert(FuzzyDates.period("February 30, 1861").isEmpty)
  }

  test("declared rejections: ambiguous or period-shaped non-ISO forms") {
    // the CONTRACT half of the r10 residual decision: these forms are
    // rejected BY DESIGN, not by accident — ambiguity maps to None (N4)
    for (v <- Seq(
      "03/04/1861",   // US two-field slash order: day-first locales disagree
      "3/4/1861",
      "March 1861",   // month-name PERIOD: only ISO YM carries period semantics
      "Marz 4, 1861", // not an English month or unique prefix
      "Ma 4, 1861",   // 2-letter prefix: ambiguous (may/march)
      "1861/03",      // slash period form: never Date-parseable
      "4 March"))     // missing year
      assert(FuzzyDates.period(v).isEmpty && FuzzyDates.minMs(v).isEmpty,
        s"must reject: $v")
  }
}
