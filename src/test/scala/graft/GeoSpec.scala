package graft

import graft.geo.Geo
import org.scalatest.funsuite.AnyFunSuite

class GeoSpec extends AnyFunSuite {
  private val latDeg = Geo.R * math.Pi / 180 // meters per degree of latitude

  test("haversine of one degree of latitude") {
    assert(math.abs(Geo.haversineM(-74, 40, -74, 41) - latDeg) < 1e-6)
  }

  test("point on segment → distance 0") {
    assert(Geo.crosstrackM(-74.0, 40.5, -74.0, 40.0, -74.0, 41.0) < 1e-6)
  }

  test("perpendicular offset from a meridian segment ≈ planar distance") {
    // 0.0001° of longitude at lat 40.5 ≈ 8.455 m
    val expected = latDeg * 0.0001 * math.cos(math.toRadians(40.5))
    val d = Geo.crosstrackM(-74.0001, 40.5, -74.0, 40.0, -74.0, 41.0)
    assert(math.abs(d - expected) < 0.01, s"d=$d expected≈$expected")
  }

  test("projection beyond endpoint clamps to endpoint haversine") {
    // point due north of the northern end of a meridian segment
    val d = Geo.crosstrackM(-74.0, 41.5, -74.0, 40.0, -74.0, 41.0)
    assert(math.abs(d - Geo.haversineM(-74.0, 41.5, -74.0, 41.0)) < 1e-9)
  }

  test("zero-length segment falls back to point distance") {
    val d = Geo.crosstrackM(-74.001, 40.5, -74.0, 40.5, -74.0, 40.5)
    assert(math.abs(d - Geo.haversineM(-74.001, 40.5, -74.0, 40.5)) < 1e-9)
  }

  test("property: symmetric under segment reversal, non-negative, ≤ endpoint dists") {
    val rnd = new scala.util.Random(42)
    def pt() = (-74.02 + rnd.nextDouble() * 0.06, 40.69 + rnd.nextDouble() * 0.08)
    for (_ <- 1 to 1000) {
      val (p, a, b) = (pt(), pt(), pt())
      val d1 = Geo.crosstrackM(p._1, p._2, a._1, a._2, b._1, b._2)
      val d2 = Geo.crosstrackM(p._1, p._2, b._1, b._2, a._1, a._2)
      assert(d1 >= 0)
      // reversal changes which endpoint is "A" but not the geometry
      assert(math.abs(d1 - d2) < 1e-6, s"asym: $d1 vs $d2")
      val ends = math.min(Geo.haversineM(p._1, p._2, a._1, a._2),
        Geo.haversineM(p._1, p._2, b._1, b._2))
      assert(d1 <= ends + 1e-6)
    }
  }

  test("property: rounding is floor(x+0.5)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 1000) {
      val x = rnd.nextDouble() * 100
      assert(Geo.roundM(x) === math.floor(x + 0.5).toLong)
    }
  }

  test("bench fixture generation is byte-deterministic") {
    import java.nio.file.Files
    def gen(): (Array[Byte], Array[Byte]) = {
      val d = Files.createTempDirectory("graft-geo-det")
      graft.geo.GenGeoFixtures.ensureScaled(d, nStreets = 500, nHouses = 2000)
      (Files.readAllBytes(d.resolve("streets.ndjson")),
        Files.readAllBytes(d.resolve("house_numbers.ndjson")))
    }
    val (s1, h1) = gen()
    val (s2, h2) = gen()
    assert(java.util.Arrays.equals(s1, s2), "streets.ndjson differs across runs")
    assert(java.util.Arrays.equals(h1, h2), "house_numbers.ndjson differs across runs")
  }
}
