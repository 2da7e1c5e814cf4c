package graft.geo

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring `spacetime-etl addresses[.<step>]`
  * (`/root/reference/README.md:113-119`): run the addresses module —
  * or one named step of it — through the generic framework runner
  * (EtlFramework), steps exchanging data via the dirs protocol.
  *
  * Usage: runMain graft.geo.RunEtl <streets.ndjson> <houseNumbers.ndjson>
  *          <baseDir> [step]
  */
object RunEtl {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: RunEtl <streets.ndjson> <houseNumbers.ndjson> <baseDir> [step]")
    val hadSession = SparkSession.getDefaultSession.nonEmpty
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try EtlFramework.run(EtlFramework.addressesModule,
      Map("streetsPath" -> args(0), "housesPath" -> args(1)),
      args(2), EtlFramework.Tools(spark), args.lift(3))
    finally if (!hadSession) spark.stop()
  }
}
