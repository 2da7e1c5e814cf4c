package graft.geo

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring `spacetime-etl addresses` (`/root/reference/
  * README.md:113-119`): run the full infer→transform pipeline over
  * Space/Time NDJSON inputs.
  *
  * Usage: runMain graft.geo.RunEtl <streets.ndjson> <houseNumbers.ndjson> <outDir>
  */
object RunEtl {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: RunEtl <streets.ndjson> <houseNumbers.ndjson> <outDir>")
    val hadSession = SparkSession.getDefaultSession.nonEmpty
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try SpacetimeEtl.runPipeline(spark, args(0), args(1), args(2))
    finally if (!hadSession) spark.stop()
  }
}
