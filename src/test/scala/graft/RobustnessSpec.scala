package graft

import graft.geo.SpacetimeEtl
import org.scalatest.funsuite.AnyFunSuite

class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("driver entry smoke: flagship query at sf0.001 returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every declared oracle key has a query implementation
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("R20: corrupt NDJSON lines become null rows, filters drop them") {
    // the reference's stream would abort on a JSON.parse throw
    // (stopOnError); the engine's declared-schema read is PERMISSIVE —
    // malformed lines yield all-null rows that the R2/R3 filters drop
    val dir = java.nio.file.Files.createTempDirectory("graft-corrupt")
    java.nio.file.Files.writeString(dir.resolve("bad.ndjson"),
      """{"id":"h1","type":"st:Address","validSince":"1860","validUntil":"1880","data":{"sheetId":1,"layerId":1,"mapId":1,"number":"9","borough":"Manhattan"},"geometry":{"type":"Point","coordinates":[-74.0,40.7]}}
        |this is not json at all {{{
        |{"id":"h2","type":"st:Address","validSince":"1860","validUntil":"1880","data":{"sheetId":2,"layerId":1,"mapId":1,"number":"11","borough":"Manhattan"},"geometry":null}
        |""".stripMargin)
    val pts = SpacetimeEtl.housePoints(
      SpacetimeEtl.readHouseNumbers(spark, dir.resolve("bad.ndjson").toString))
    // h1 survives; the corrupt line and the null-geometry h2 are dropped
    assert(pts.collect().map(_.getString(0)).toSeq === Seq("h1"))
  }

  test("fixture generator is deterministic (re-run reproduces committed files)") {
    val out = java.nio.file.Files.createTempDirectory("graft-geo-regen")
    graft.geo.GenGeoFixtures.main(Array(out.toString))
    for (f <- Seq("streets.ndjson", "house_numbers.ndjson")) {
      val a = java.nio.file.Files.readAllBytes(out.resolve(f))
      val b = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"${graft.geo.GeoQueries.FixtureDir}/$f"))
      assert(java.util.Arrays.equals(a, b), s"$f differs from committed fixture")
    }
  }
}
