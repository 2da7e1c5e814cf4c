package graft

import graft.geo.{GeoQueries, SpacetimeEtl}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline over the seeded fixtures: record shapes and counts
  * of the reference's two steps (infer → transform, FIXTURES.md §2c/§2d). */
class SpacetimeEtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = GeoQueries.FixtureDir

  private lazy val inferred = SpacetimeEtl.infer(spark,
    SpacetimeEtl.readStreets(spark, s"$dir/streets.ndjson"),
    SpacetimeEtl.readHouseNumbers(spark, s"$dir/house_numbers.ndjson")).cache()

  test("infer: one row per valid house point, matched + error partition") {
    val total = inferred.count()
    val matched = inferred.where("streetId IS NOT NULL").count()
    val errors = inferred.where("error IS NOT NULL").count()
    assert(total === 312) // valid st:Address points in the fixture (r10: +7 datetime rows)
    assert(matched + errors === total)
    assert(matched > 200 && errors > 30) // fixture mix per FIXTURES.md §3
    // matched rows carry the reference's inferred.ndjson fields
    val row = inferred.where("streetId IS NOT NULL")
      .selectExpr("id", "name", "houseNumberId", "streetId", "lineLength").first()
    assert(row.getString(2).startsWith("building-inspector/"))
    assert(row.getString(3).startsWith("nyc-streets/"))
    assert(row.getLong(4) < 25)
  }

  test("transform: 4 records per match, 1 per error, N5 merged log payload") {
    val matched = inferred.where("streetId IS NOT NULL").count()
    val errors = inferred.where("error IS NOT NULL").count()
    val records = SpacetimeEtl.transform(inferred).cache()
    assert(records.count() === 4 * matched + errors)
    assert(records.where("type = 'object'").count() === matched)
    assert(records.where("type = 'relation'").count() === 2 * matched)
    assert(records.where("type = 'log'").count() === matched + errors)
    // N5: a matched log's addressData contains the merged ids
    val log = records.where("type = 'log' AND obj LIKE '%streetName%'")
      .select("obj").first().getString(0)
    assert(log.contains("\"houseNumberId\"") && log.contains("\"streetId\""))
  }

  test("R14: pre-prefixed ids are not double-prefixed, internal ids stripped") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-r14")
    // same shapes as the fixture, but ids already carry dataset prefixes
    // (legal in the Space/Time model — addresses.js:20-34 normalizes
    // conditionally)
    java.nio.file.Files.write(tmp.resolve("streets.ndjson"),
      ("""{"id":"nyc-streets/s001","type":"st:Street","name":"Prefixed St","validSince":"1850","validUntil":"1920","data":{},""" +
        """"geometry":{"type":"LineString","coordinates":[[-74.0,40.71],[-73.999,40.71]]}}""" + "\n").getBytes)
    java.nio.file.Files.write(tmp.resolve("houses.ndjson"),
      ("""{"id":"building-inspector/h001","type":"st:Address","validSince":"1860","validUntil":"1880",""" +
        """"data":{"sheetId":1,"layerId":1,"mapId":1,"number":"12","borough":"Manhattan"},""" +
        """"geometry":{"type":"Point","coordinates":[-73.9995,40.710050]}}""" + "\n").getBytes)
    val inf = SpacetimeEtl.infer(spark,
      SpacetimeEtl.readStreets(spark, tmp.resolve("streets.ndjson").toString),
      SpacetimeEtl.readHouseNumbers(spark, tmp.resolve("houses.ndjson").toString))
    val row = inf.selectExpr("id", "houseNumberId", "streetId").first()
    assert(row.getString(0) === "h001")                       // getInternalId strips
    assert(row.getString(1) === "building-inspector/h001")    // getFullId passes through
    assert(row.getString(2) === "nyc-streets/s001")
    // bare ids still get the prefix (fixture behavior unchanged)
    val bare = inferred.where("streetId IS NOT NULL")
      .selectExpr("houseNumberId").first().getString(0)
    assert(bare.startsWith("building-inspector/") && !bare.contains("//")
      && bare.count(_ == '/') === 1)
  }

  test("runPipeline writes inferred + per-type record partitions") {
    val out = java.nio.file.Files.createTempDirectory("graft-etl").toString
    SpacetimeEtl.runPipeline(spark, s"$dir/streets.ndjson",
      s"$dir/house_numbers.ndjson", out)
    val inferredBack = spark.read.json(s"$out/inferred")
    assert(inferredBack.count() === 312)
    val logs = spark.read.text(s"$out/records/type=log")
    assert(logs.count() > 0)
  }
}
