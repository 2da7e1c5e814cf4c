package graft

import java.nio.file.{Files, Paths}

import graft.geo.GeoQueries

/** Regenerates the committed golden CSVs for GeoGoldenSpec from the
  * current engine output — run ONLY after the same queries have passed
  * the DuckDB oracle gate (tools/check.py), so the goldens stay
  * "produced from a DuckDB-verified run":
  *
  *   sbt "Test/runMain graft.GenGeoGolden"
  */
object GenGeoGolden {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val goldenDir = Paths.get(s"${GeoQueries.FixtureDir}/golden")
    Files.createDirectories(goldenDir)
    for (q <- Seq("g01_segmentize", "g02_nearest", "g03_transform")) {
      val df = GeoQueries.queries(q)(spark, TestSpark.Sf)
      val header = df.columns.mkString(",")
      val rows = df.collect().map(
        _.toSeq.map(v => if (v == null) "NULL_" else String.valueOf(v))
          .mkString(","))
      Files.write(goldenDir.resolve(s"$q.csv"),
        (header +: rows).mkString("", "\n", "\n").getBytes("UTF-8"))
      println(s"wrote ${rows.length} rows to golden/$q.csv")
    }
    spark.stop()
  }
}
