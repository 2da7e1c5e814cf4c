package graft.geo

import java.lang.Math._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.mutable.ArrayBuffer
import scala.util.Random

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Deterministic (seed=42) geo fixture generator → `src/test/resources/geo/`
  * per FIXTURES.md §3. Committed together with its output; re-running must
  * reproduce the same files bit-for-bit.
  *
  * Outputs:
  *  - `streets.ndjson` / `house_numbers.ndjson` — Space/Time NDJSON the
  *    Spark engine consumes (reference input shapes, FIXTURES.md §2).
  *  - `street_segments.parquet` / `house_points.parquet` — flat oracle-side
  *    tables with precomputed fuzzy-date endpoints, consumed by the DuckDB
  *    G01–G03 SQL.
  *
  * Cross-engine float safety: every generated house point is rejected and
  * resampled unless, for every date-valid segment within 60 m, the raw
  * crosstrack distance has |frac−0.5| > 2e-3 — so Java-vs-C libm last-ulp
  * differences can never flip the D4 integer rounding (and therefore never
  * flip the 25 m threshold or the top-1 choice either, both of which are
  * defined over the rounded integer).
  */
object GenGeoFixtures {
  val MPerDegLat = 111194.927
  def mPerDegLon(lat: Double): Double = MPerDegLat * cos(toRadians(lat))

  case class Street(id: String, name: String, since: String, until: String,
                    coords: Array[Array[Double]]) // null coords = null geometry
  case class Seg(streetId: String, name: String, ord: Int,
                 x1: Double, y1: Double, x2: Double, y2: Double,
                 sinceMin: Option[Long], untilMax: Option[Long])
  case class House(id: String, tpe: String, since: String, until: String,
                   sheetId: Int, layerId: Int, mapId: Int, number: String,
                   borough: String, pt: Array[Double]) // null pt = null geometry

  private val boroughs = Seq("Manhattan", "Brooklyn", "Queens", "Bronx", "Staten Island")

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "/root/repo/src/test/resources/geo")
    Files.createDirectories(outDir)
    val rnd = new Random(42)

    // ---- streets -------------------------------------------------------
    val streets = ArrayBuffer[Street]()
    for (i <- 1 to 40) {
      val n = 2 + rnd.nextInt(7)
      var x = -74.005 + rnd.nextDouble() * 0.030
      var y = 40.705 + rnd.nextDouble() * 0.050
      var heading = rnd.nextDouble() * 2 * PI
      val cs = ArrayBuffer(Array(x, y))
      for (_ <- 1 until n) {
        val step = 80 + rnd.nextDouble() * 220 // meters
        heading += (rnd.nextDouble() - 0.5) * 1.4
        x += step * cos(heading) / mPerDegLon(y)
        y += step * sin(heading) / MPerDegLat
        cs += Array(x, y)
      }
      val sy = 1850 + rnd.nextInt(40)
      val uy = sy + 5 + rnd.nextInt(35)
      streets += Street(f"s$i%03d", s"Street $i", dateStr(rnd, sy), dateStr(rnd, uy), cs.toArray)
    }
    // 4 parallel pairs (s041..s048) for top-1 / tie tests: horizontal
    // 300 m twin segments, pair 0/2 separated 30 m (distinct rounded
    // distances), pair 1/3 separated 20.4 m (equal rounded → tie-break).
    val pairSep = Seq(30.0, 20.4, 30.0, 20.4)
    for (p <- 0 until 4) {
      val baseLat = 40.706 + p * 0.013
      val lon0 = -74.008 + p * 0.009
      val dLon = 300.0 / mPerDegLon(baseLat)
      val latB = baseLat + pairSep(p) / MPerDegLat
      streets += Street(f"s${41 + 2 * p}%03d", s"Pair ${p}A", "1850", "1900",
        Array(Array(lon0, baseLat), Array(lon0 + dLon, baseLat)))
      streets += Street(f"s${42 + 2 * p}%03d", s"Pair ${p}B", "1850", "1900",
        Array(Array(lon0, latB), Array(lon0 + dLon, latB)))
    }
    // null-geometry streets (exercise R3) + unparseable dates (N4)
    for (i <- 49 to 51) streets += Street(f"s$i%03d", s"Street $i", "1860", "1880", null)
    streets += Street("s052", "Street 52", "unknown", "1880",
      Array(Array(-73.995, 40.752), Array(-73.993, 40.7525)))
    streets += Street("s053", "Street 53", "1860", "18??",
      Array(Array(-73.990, 40.754), Array(-73.988, 40.7545)))

    val allSegs: Seq[Seg] = streets.filter(_.coords != null).flatMap { st =>
      st.coords.sliding(2).zipWithIndex.map { case (Array(a, b), ord) =>
        Seg(st.id, st.name, ord, a(0), a(1), b(0), b(1),
          FuzzyDates.minMs(st.since), FuzzyDates.maxMs(st.until))
      }
    }.toSeq
    val dateValid = allSegs.filter(s => s.sinceMin.isDefined && s.untilMax.isDefined)

    def marginsOk(px: Double, py: Double): Boolean = dateValid.forall { g =>
      val d = Geo.crosstrackM(px, py, g.x1, g.y1, g.x2, g.y2)
      d >= 60 || abs(d - floor(d) - 0.5) > 2e-3
    }
    def minDist(px: Double, py: Double): Double =
      dateValid.map(g => Geo.crosstrackM(px, py, g.x1, g.y1, g.x2, g.y2)).min
    def compatible(aS: String, aU: String, g: Seg): Boolean = (for {
      sm <- g.sinceMin; um <- g.untilMax
      am <- FuzzyDates.minMs(aS); bm <- FuzzyDates.maxMs(aU)
    } yield sm - FuzzyDates.ThresholdMs <= am && um + FuzzyDates.ThresholdMs >= bm)
      .getOrElse(false)

    // segments eligible as "near-one" targets: parseable dates
    val targets = dateValid.toIndexedSeq

    // ---- house numbers -------------------------------------------------
    val houses = ArrayBuffer[House]()
    var hi = 0
    def nextHouse(id: String, tpe: String, since: String, until: String,
                  pt: Array[Double]): House = {
      hi += 1
      House(id, tpe, since, until, 1000 + hi, hi % 7, 1 + hi % 13,
        (1 + rnd.nextInt(299)).toString, boroughs(hi % 5), pt)
    }

    var tieIdx = 0
    for (i <- 1 to 300) {
      val id = f"h$i%03d"
      val cat = i % 10
      if (cat == 7) {
        // temporally incompatible (year < 1835 fails every segment's
        // sinceMin - 15y <= addrSinceMin conjunct)
        val (px, py) = sampleNear(rnd, targets, marginsOk)
        val y0 = 1700 + rnd.nextInt(120)
        val h = nextHouse(id, "st:Address", y0.toString, (y0 + 5).toString, Array(px, py))
        require(dateValid.forall(g => !compatible(h.since, h.until, g)), s"$id not incompatible")
        houses += h
      } else if (cat == 8) {
        // spatially unmatched: > 27 m from every date-valid segment
        var px = 0.0; var py = 0.0; var ok = false
        while (!ok) {
          px = -74.012 + rnd.nextDouble() * 0.040
          py = 40.700 + rnd.nextDouble() * 0.062
          ok = minDist(px, py) > 27 && marginsOk(px, py)
        }
        houses += nextHouse(id, "st:Address", (1855 + rnd.nextInt(30)).toString,
          (1890 + rnd.nextInt(10)).toString, Array(px, py))
      } else if (cat == 9 && i <= 100) {
        // between a parallel pair: pair 0/2 → distinct rounded distances,
        // pair 1/3 → equal rounded distance (tie-break on street_id)
        val p = tieIdx % 4; tieIdx += 1
        val baseLat = 40.706 + p * 0.013
        val lon0 = -74.008 + p * 0.009
        val dLon = 300.0 / mPerDegLon(baseLat)
        val wantTie = pairSep(p) == 20.4
        var px = 0.0; var py = 0.0; var ok = false
        var tries = 0
        while (!ok && tries < 10000) {
          tries += 1
          px = lon0 + (0.2 + 0.6 * rnd.nextDouble()) * dLon
          val dA = if (wantTie) 10.05 + rnd.nextDouble() * 0.15
                   else 8.6 + rnd.nextDouble() * 0.8
          py = baseLat + dA / MPerDegLat
          val a = streets.find(_.name == s"Pair ${p}A").get
          val b = streets.find(_.name == s"Pair ${p}B").get
          val d1 = Geo.crosstrackM(px, py, a.coords(0)(0), a.coords(0)(1), a.coords(1)(0), a.coords(1)(1))
          val d2 = Geo.crosstrackM(px, py, b.coords(0)(0), b.coords(0)(1), b.coords(1)(0), b.coords(1)(1))
          val rounds = (Geo.roundM(d1), Geo.roundM(d2))
          val shape = if (wantTie) rounds._1 == rounds._2 else rounds._1 != rounds._2
          ok = shape && rounds._1 < 25 && rounds._2 < 25 && marginsOk(px, py)
        }
        require(ok, s"could not place pair point $id")
        houses += nextHouse(id, "st:Address", (1860 + rnd.nextInt(5)).toString,
          (1870 + rnd.nextInt(10)).toString, Array(px, py))
      } else {
        // near one segment, temporally compatible with it
        var placed = false
        while (!placed) {
          val g = targets(rnd.nextInt(targets.length))
          val (px, py) = offsetFrom(rnd, g)
          if (marginsOk(px, py) && minDist(px, py) < 24) {
            // derive years from the segment's period: aY in [segY, segY+8]
            val segY = java.time.Instant.ofEpochMilli(g.sinceMin.get)
              .atZone(java.time.ZoneOffset.UTC).getYear
            val segUY = java.time.Instant.ofEpochMilli(g.untilMax.get)
              .atZone(java.time.ZoneOffset.UTC).getYear
            val aY = (segY + rnd.nextInt(9)).min(segUY + 13)
            val bY = (aY + rnd.nextInt(16)).min(segUY + 13).max(aY)
            val since = dateStr(rnd, aY); val until = dateStr(rnd, bY)
            if (compatible(since, until, g)) {
              houses += nextHouse(id, "st:Address", since, until, Array(px, py))
              placed = true
            }
          }
        }
      }
    }
    // junk rows: wrong type (R2), null geometry (R3), unparseable dates (N4)
    for (i <- 1 to 10)
      houses += nextHouse(f"hx$i%02d", "st:Street", "1860", "1880",
        Array(-74.0 + i * 0.001, 40.71))
    for (i <- 1 to 5)
      houses += nextHouse(f"hn$i%02d", "st:Address", "1860", "1880", null)
    for (i <- 1 to 5) {
      val (px, py) = sampleNear(rnd, targets, marginsOk)
      val (s, u) = i match {
        case 1 => ("once upon", "1880")
        case 2 => ("1860", "18??")
        case 3 => (null, "1880")      // missing validSince key
        case 4 => ("1860-13", "1880") // invalid month
        case _ => ("1860", null)      // missing validUntil key
      }
      houses += nextHouse(f"hb$i%02d", "st:Address", s, u, Array(px, py))
    }

    // ---- round-10 datetime-precision rows (r9 verdict item 4) ----------
    // The fuzzy-date grammar now accepts full ISO datetimes; these rows
    // make g01–g03 EXERCISE that precision: compatibility boundaries that
    // flip on a single millisecond, so a parser that silently truncated
    // to day precision would hash-mismatch. Appended AFTER the legacy
    // generation with a separate Random(43) (legacy rnd-42 stream — and
    // therefore every previously committed row — stays bit-identical) in
    // an isolated region ~6 km north of the legacy bbox (no legacy house
    // is within 60 m of these segments and vice versa).
    val rnd43 = new Random(43)
    val dtLat = 40.8200
    val dtLon = -74.0080
    val dtDLon = 300.0 / mPerDegLon(dtLat)
    val dtLatB = dtLat + 200.0 / MPerDegLat
    // s054: datetime-precision validity (seconds + millis); s055: the
    // date-only control 200 m north
    val s054 = Street("s054", "Datetime Street", "1861-03-04T12:30:00",
      "1875-09-01T06:00:00.500", Array(Array(dtLon, dtLat), Array(dtLon + dtDLon, dtLat)))
    val s055 = Street("s055", "Datetime Control", "1858", "1890",
      Array(Array(dtLon, dtLatB), Array(dtLon + dtDLon, dtLatB)))
    streets += s054; streets += s055
    val dtSegs: Seq[Seg] = Seq(s054, s055).flatMap { st =>
      st.coords.sliding(2).zipWithIndex.map { case (Array(a, b), ord) =>
        Seg(st.id, st.name, ord, a(0), a(1), b(0), b(1),
          FuzzyDates.minMs(st.since), FuzzyDates.maxMs(st.until))
      }
    }
    val dtValid = dateValid ++ dtSegs
    def dtMarginsOk(px: Double, py: Double): Boolean = dtValid.forall { g =>
      val d = Geo.crosstrackM(px, py, g.x1, g.y1, g.x2, g.y2)
      d >= 60 || abs(d - floor(d) - 0.5) > 2e-3
    }
    def placeNear(g: Seg): Array[Double] = {
      var r = offsetFrom(rnd43, g)
      while (!(dtMarginsOk(r._1, r._2)
        && Geo.roundM(Geo.crosstrackM(r._1, r._2, g.x1, g.y1, g.x2, g.y2)) < 25))
        r = offsetFrom(rnd43, g)
      Array(r._1, r._2)
    }
    def fmtInstant(ms: Long): String = {
      val i = java.time.Instant.ofEpochMilli(ms).atZone(java.time.ZoneOffset.UTC)
      f"${i.getYear}%04d-${i.getMonthValue}%02d-${i.getDayOfMonth}%02d" +
        f"T${i.getHour}%02d:${i.getMinute}%02d:${i.getSecond}%02d" +
        f".${i.getNano / 1000000}%03d"
    }
    val segA = dtSegs.head           // s054
    val segB = dtSegs.last           // s055
    val sinceBound = segA.sinceMin.get - FuzzyDates.ThresholdMs
    val untilBound = segA.untilMax.get + FuzzyDates.ThresholdMs
    // since-side boundary: exactly AT the threshold passes, 1 ms before
    // it fails (the conjunct is segSince − T <= houseSince); a
    // day-precision parse would floor both to the same midnight and
    // could not tell them apart
    houses += nextHouse("hd01", "st:Address", fmtInstant(sinceBound),
      "1870", placeNear(segA))
    houses += nextHouse("hd02", "st:Address", fmtInstant(sinceBound - 1L),
      "1870", placeNear(segA))
    // until-side boundary: the segment's .500 millis participate —
    // exactly AT segUntilMax + T passes, 1 ms past fails
    houses += nextHouse("hd03", "st:Address", "1862",
      fmtInstant(untilBound), placeNear(segA))
    houses += nextHouse("hd04", "st:Address", "1862",
      fmtInstant(untilBound + 1L), placeNear(segA))
    // seconds-precision datetimes well inside range (plain matches):
    // against the datetime segment and against the date-only control
    houses += nextHouse("hd05", "st:Address", "1862-07-01T23:59:59",
      "1871-01-15T08:45:30.250", placeNear(segA))
    houses += nextHouse("hd06", "st:Address", "1863-02-11T00:00:01",
      "1872", placeNear(segB))
    // minute-precision form (seconds default :00) + a Z-suffixed instant
    houses += nextHouse("hd07", "st:Address", "1864-05-20T10:15",
      "1870-08-08T20:00:00Z", placeNear(segB))

    // ---- NDJSON --------------------------------------------------------
    writeLines(outDir.resolve("streets.ndjson"), streets.toSeq.map(streetJson))
    writeLines(outDir.resolve("house_numbers.ndjson"), houses.toSeq.map(houseJson))

    // ---- oracle parquet ------------------------------------------------
    // reuse a live session if one exists (e.g. under the test runner) and
    // only stop a session this main itself created
    val hadSession = SparkSession.getDefaultSession.nonEmpty
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    writeSingle(spark,
      (allSegs ++ dtSegs).map(g => (g.streetId, g.name, g.ord, g.x1, g.y1,
        g.x2, g.y2, g.sinceMin, g.untilMax))
        .toDF("street_id", "street_name", "seg_ord", "x1", "y1", "x2", "y2",
          "since_min_ms", "until_max_ms"),
      outDir.resolve("street_segments.parquet"))
    val hp = houses.filter(h => h.tpe == "st:Address" && h.pt != null)
      .map(h => (h.id, h.number, h.borough, h.sheetId, h.layerId, h.mapId,
        h.pt(0), h.pt(1), Option(h.since), Option(h.until),
        Option(h.since).flatMap(FuzzyDates.minMs),
        Option(h.until).flatMap(FuzzyDates.maxMs)))
    writeSingle(spark,
      hp.toSeq.toDF("hn_id", "number", "borough", "sheet_id", "layer_id", "map_id",
        "px", "py", "valid_since", "valid_until", "since_min_ms", "until_max_ms"),
      outDir.resolve("house_points.parquet"))
    if (!hadSession) spark.stop()
    println(s"wrote ${streets.size} streets (${allSegs.size} segments), " +
      s"${houses.size} house rows (${hp.size} valid points) to $outDir")
  }

  /** Bench-scale fixture: sf-proportional streets/houses in the same
    * NDJSON record shapes, WITHOUT the oracle float-margin machinery —
    * the committed ~350-point fixture remains the correctness contract;
    * this one only feeds Bench so the grid join runs at real size.
    * Deterministic (seed = 7), generated lazily on first use, and
    * density-preserving: the bbox area scales with the street count so
    * per-cell candidate fan-out stays constant as sf grows. */
  def ensureScaled(outDir: Path, nStreets: Int, nHouses: Int): Path = synchronized {
    val marker = outDir.resolve("_SUCCESS")
    // the parquet check upgrades pre-existing NDJSON-only fixture dirs
    // (earlier rounds wrote no oracle twins) in place
    if (Files.exists(marker)
        && Files.exists(outDir.resolve("street_segments.parquet"))) return outDir
    Files.createDirectories(outDir)
    val rnd = new Random(7)
    val scale = sqrt(nStreets / 44.0)
    val lonSpan = 0.030 * scale
    val latSpan = 0.050 * scale
    val streets = new ArrayBuffer[Street](nStreets)
    val segs = new ArrayBuffer[Seg](nStreets * 4)
    for (i <- 1 to nStreets) {
      val n = 2 + rnd.nextInt(7)
      var x = -74.005 + rnd.nextDouble() * lonSpan
      var y = 40.705 + rnd.nextDouble() * latSpan
      var heading = rnd.nextDouble() * 2 * PI
      val cs = ArrayBuffer(Array(x, y))
      for (_ <- 1 until n) {
        val step = 80 + rnd.nextDouble() * 220
        heading += (rnd.nextDouble() - 0.5) * 1.4
        x += step * cos(heading) / mPerDegLon(y)
        y += step * sin(heading) / MPerDegLat
        cs += Array(x, y)
      }
      val sy = 1850 + rnd.nextInt(40)
      val uy = sy + 5 + rnd.nextInt(35)
      val st = Street(f"s$i%06d", s"Street $i", dateStr(rnd, sy), dateStr(rnd, uy), cs.toArray)
      streets += st
      st.coords.sliding(2).zipWithIndex.foreach { case (Array(a, b), ord) =>
        segs += Seg(st.id, st.name, ord, a(0), a(1), b(0), b(1),
          FuzzyDates.minMs(st.since), FuzzyDates.maxMs(st.until))
      }
    }
    val targets = segs.toIndexedSeq
    val houses = new ArrayBuffer[House](nHouses)
    for (i <- 1 to nHouses) {
      val g = targets(rnd.nextInt(targets.length))
      val cat = i % 10
      // 80% near a segment with compatible dates, 10% spatially far
      // (error path), 10% temporally incompatible (error path)
      val (px, py) = if (cat == 8) {
        val t = rnd.nextDouble()
        val off = (60 + 400 * rnd.nextDouble()) / MPerDegLat
        (g.x1 + t * (g.x2 - g.x1) + off, g.y1 + t * (g.y2 - g.y1) + off)
      } else offsetFrom(rnd, g)
      val segY = java.time.Instant.ofEpochMilli(g.sinceMin.get)
        .atZone(java.time.ZoneOffset.UTC).getYear
      val (since, until) =
        if (cat == 7) { val y0 = 1700 + rnd.nextInt(100); (y0.toString, (y0 + 5).toString) }
        else { val aY = segY + rnd.nextInt(6); (dateStr(rnd, aY), dateStr(rnd, aY + rnd.nextInt(12))) }
      houses += House(f"h$i%07d", "st:Address", since, until, 1000 + i, i % 7,
        1 + i % 13, (1 + rnd.nextInt(299)).toString, boroughs(i % 5), Array(px, py))
    }
    writeLines(outDir.resolve("streets.ndjson"), streets.toSeq.map(streetJson))
    writeLines(outDir.resolve("house_numbers.ndjson"), houses.toSeq.map(houseJson))
    // oracle parquet twins (same shapes as the committed fixture) so the
    // DuckDB G-query baseline is timeable at bench scale, not just on the
    // 350-row correctness fixture
    val hadSession = SparkSession.getDefaultSession.nonEmpty
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    writeSingle(spark,
      segs.toSeq.map(g => (g.streetId, g.name, g.ord, g.x1, g.y1, g.x2, g.y2,
        g.sinceMin, g.untilMax))
        .toDF("street_id", "street_name", "seg_ord", "x1", "y1", "x2", "y2",
          "since_min_ms", "until_max_ms"),
      outDir.resolve("street_segments.parquet"))
    writeSingle(spark,
      houses.toSeq.map(h => (h.id, h.number, h.borough, h.sheetId, h.layerId,
        h.mapId, h.pt(0), h.pt(1), Option(h.since), Option(h.until),
        Option(h.since).flatMap(FuzzyDates.minMs),
        Option(h.until).flatMap(FuzzyDates.maxMs)))
        .toDF("hn_id", "number", "borough", "sheet_id", "layer_id", "map_id",
          "px", "py", "valid_since", "valid_until", "since_min_ms", "until_max_ms"),
      outDir.resolve("house_points.parquet"))
    if (!hadSession) spark.stop()
    Files.write(marker, Array.emptyByteArray)
    outDir
  }

  // ---- helpers ---------------------------------------------------------

  private def dateStr(rnd: Random, y: Int): String =
    if (rnd.nextDouble() < 0.8) y.toString else f"$y-${1 + rnd.nextInt(12)}%02d"

  /** Random point 2–20 m perpendicular off a random position along `g`. */
  private def offsetFrom(rnd: Random, g: Seg): (Double, Double) = {
    val t = 0.1 + 0.8 * rnd.nextDouble()
    val bx = g.x1 + t * (g.x2 - g.x1); val by = g.y1 + t * (g.y2 - g.y1)
    val ex = (g.x2 - g.x1) * mPerDegLon(by); val ey = (g.y2 - g.y1) * MPerDegLat
    val len = hypot(ex, ey)
    val o = (2 + 18 * rnd.nextDouble()) * (if (rnd.nextBoolean()) 1 else -1)
    (bx - o * (ey / len) / mPerDegLon(by), by + o * (ex / len) / MPerDegLat)
  }

  private def sampleNear(rnd: Random, targets: IndexedSeq[Seg],
                         ok: (Double, Double) => Boolean): (Double, Double) = {
    var r = offsetFrom(rnd, targets(rnd.nextInt(targets.length)))
    while (!ok(r._1, r._2)) r = offsetFrom(rnd, targets(rnd.nextInt(targets.length)))
    r
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def coords2(cs: Array[Array[Double]]): String =
    cs.map(c => s"[${c(0)},${c(1)}]").mkString("[", ",", "]")

  private def streetJson(st: Street): String = {
    val geom = if (st.coords == null) "null"
      else s"""{"type":"LineString","coordinates":${coords2(st.coords)}}"""
    s"""{"id":${jstr(st.id)},"type":"st:Street","name":${jstr(st.name)},""" +
      s""""validSince":${jstr(st.since)},"validUntil":${jstr(st.until)},""" +
      s""""data":{},"geometry":$geom}"""
  }

  private def houseJson(h: House): String = {
    val geom = if (h.pt == null) "null"
      else s"""{"type":"Point","coordinates":[${h.pt(0)},${h.pt(1)}]}"""
    val since = if (h.since == null) "" else s""""validSince":${jstr(h.since)},"""
    val until = if (h.until == null) "" else s""""validUntil":${jstr(h.until)},"""
    s"""{"id":${jstr(h.id)},"type":${jstr(h.tpe)},$since$until""" +
      s""""data":{"sheetId":${h.sheetId},"layerId":${h.layerId},"mapId":${h.mapId},""" +
      s""""number":${jstr(h.number)},"borough":${jstr(h.borough)}},"geometry":$geom}"""
  }

  private def writeLines(p: Path, lines: Seq[String]): Unit =
    Files.write(p, lines.mkString("", "\n", "\n").getBytes("UTF-8"))

  /** Write a DataFrame as ONE parquet file at `target` (move the single
    * part file out of the Spark output dir so DuckDB can read_parquet it
    * by plain path). */
  private def writeSingle(spark: SparkSession,
                          df: org.apache.spark.sql.DataFrame, target: Path): Unit = {
    val tmp = target.toString + ".tmpdir"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    // clean the tmp dir
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
  }
}
