package graft

import graft.geo.GeoQueries
import org.scalatest.funsuite.AnyFunSuite

/** Golden-output regression for the geo suite (FIXTURES.md §3): the
  * committed CSVs were produced from a DuckDB-verified run; any drift in
  * fixtures, fuzzy-date parsing, crosstrack math, or the join pipeline
  * shows up here without needing the oracle. */
class GeoGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val goldenDir = s"${GeoQueries.FixtureDir}/golden"

  private def check(q: String): Unit = {
    val got = GeoQueries.queries(q)(spark, TestSpark.Sf)
      .collect()
      .map(_.toSeq.map(v => if (v == null) "NULL_" else String.valueOf(v))
        .mkString("|"))
    val want = spark.read.option("header", "true")
      .option("nullValue", "__never__") // keep NULL_ sentinel as text
      .csv(s"$goldenDir/$q.csv")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|"))
    assert(got.length === want.length, s"$q row count")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g === w, s"$q row $i")
    }
  }

  test("g01 segmentize matches golden") { check("g01_segmentize") }
  test("g02 nearest matches golden") { check("g02_nearest") }
  test("g03 transform matches golden") { check("g03_transform") }
}
