package graft

import graft.geo.{Geo, SpacetimeEtl}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2(2)/§7 hard-part 3: prove the grid candidate join has
  * perfect 25 m recall by brute force over random geometries — including
  * points placed exactly on grid-cell boundaries and offsets straddling
  * the 25 m threshold (engine-internal comparison, so no cross-engine
  * float margins are needed here). */
class GridRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val MDeg = 111194.927

  test("grid join == O(N·M) brute force on random fixtures") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 3) {
      // random segments: some tiny, some long, some crossing cell borders
      val segs = (1 to 25).map { i =>
        val x1 = -74.01 + rnd.nextDouble() * 0.04
        val y1 = 40.70 + rnd.nextDouble() * 0.06
        val len = (5 + rnd.nextDouble() * 400) / MDeg
        val ang = rnd.nextDouble() * 2 * math.Pi
        (f"s$i%03d", s"St $i", 0L, 100000000000000L, i % 3,
          x1, y1, x1 + len * math.cos(ang), y1 + len * math.sin(ang))
      }
      val pts = (1 to 120).map { i =>
        val (px, py) = if (i % 5 == 0) {
          // exactly on a grid-cell corner
          (math.floor((-74.01 + rnd.nextDouble() * 0.04) / 0.0005) * 0.0005,
            math.floor((40.70 + rnd.nextDouble() * 0.06) / 0.0005) * 0.0005)
        } else if (i % 3 == 0) {
          // within ~5..45 m of a random segment (straddles the threshold)
          val g = segs(rnd.nextInt(segs.length))
          val t = rnd.nextDouble()
          val off = (5 + rnd.nextDouble() * 40) / MDeg
          val a = rnd.nextDouble() * 2 * math.Pi
          (g._6 + t * (g._8 - g._6) + off * math.cos(a),
            g._7 + t * (g._9 - g._7) + off * math.sin(a))
        } else {
          (-74.012 + rnd.nextDouble() * 0.044, 40.698 + rnd.nextDouble() * 0.064)
        }
        (f"h$i%03d", px, py, 0L, 1L)
      }
      val segDf = segs.toDF("street_id", "street_name", "seg_since",
        "seg_until", "seg_ord", "x1", "y1", "x2", "y2")
      val ptDf = pts.toDF("hn_id", "px", "py", "pt_since", "pt_until")
      val got = SpacetimeEtl.bestMatch(spark, segDf, ptDf)
        .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(3))).toMap
      val want = pts.flatMap { case (hid, px, py, _, _) =>
        val cands = segs.map { g =>
          (Geo.roundM(Geo.crosstrackM(px, py, g._6, g._7, g._8, g._9)), g._5, g._1)
        }.filter(_._1 < 25)
        if (cands.isEmpty) None
        else { val b = cands.min; Some(hid -> (b._3, b._1)) }
      }.toMap
      assert(got === want, s"trial $trial: grid join != brute force " +
        s"(missing=${(want.keySet -- got.keySet).take(3)}, " +
        s"extra=${(got.keySet -- want.keySet).take(3)})")
    }
  }

  test("bench-scale fixture: sampled brute force == matchPoints (recall at real density)") {
    import graft.geo.GeoQueries
    val dir = GeoQueries.geoDir("/root/testdata/sf0.1") // generates if absent
    val segs = GeoQueries.segments(spark, dir)
    val hps = GeoQueries.housePoints(spark, dir)
    val sample = hps.sample(withReplacement = false, 0.002, seed = 42)
      .limit(200).cache()
    val nSample = sample.count()
    assert(nSample >= 100, s"sample too small: $nSample")
    val got = SpacetimeEtl.matchPoints(spark, segs, sample)
      .select("hn_id", "sid", "distance_m").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getString(1), r.getLong(2))))).toMap
    assert(got.size.toLong === nSample, "matchPoints dropped or duplicated points")
    // driver-side brute force over ALL segments (the O(N·M) pass the grid
    // join must reproduce exactly, temporal rule included)
    val segRows = segs.collect().map { r =>
      (r.getString(r.fieldIndex("street_id")),
        if (r.isNullAt(r.fieldIndex("seg_since"))) None else Some(r.getLong(r.fieldIndex("seg_since"))),
        if (r.isNullAt(r.fieldIndex("seg_until"))) None else Some(r.getLong(r.fieldIndex("seg_until"))),
        r.getInt(r.fieldIndex("seg_ord")),
        r.getDouble(r.fieldIndex("x1")), r.getDouble(r.fieldIndex("y1")),
        r.getDouble(r.fieldIndex("x2")), r.getDouble(r.fieldIndex("y2")))
    }
    val slack = SpacetimeEtl.SlackMs
    val ptRows = sample.select("hn_id", "px", "py", "pt_since", "pt_until").collect()
    var checked = 0
    ptRows.foreach { p =>
      val hid = p.getString(0)
      val (px, py) = (p.getDouble(1), p.getDouble(2))
      val want: Option[(String, Long)] =
        if (p.isNullAt(3) || p.isNullAt(4)) None
        else {
          val (ps, pu) = (p.getLong(3), p.getLong(4))
          val cands = segRows.iterator.flatMap { g =>
            (g._2, g._3) match {
              case (Some(ss), Some(su))
                if ss - slack <= ps && su + slack >= pu =>
                val d = Geo.roundM(Geo.crosstrackM(px, py, g._5, g._6, g._7, g._8))
                if (d < 25) Some((d, g._4, g._1)) else None
              case _ => None
            }
          }.toSeq
          if (cands.isEmpty) None else { val b = cands.min; Some((b._3, b._1)) }
        }
      assert(got(hid) === want, s"point $hid: grid=${got(hid)} brute=$want")
      checked += 1
    }
    info(s"verified $checked sampled points against ${segRows.length} segments")
  }
}
