package graft

import graft.geo.{EtlFramework, SpacetimeEtl}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the generic (config, dirs, tools) runner (round 10, verdict
  * residual 3): the addresses module run through the framework must
  * produce byte-identical records to the hand-wired runPipeline, step
  * selection must mirror `spacetime-etl addresses.<step>` (previous
  * resolved from the declared order), and the dirs protocol must
  * resolve other modules' outputs. */
class EtlFrameworkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Fx = "/root/repo/src/test/resources/geo"

  private def records(dir: String): Seq[(String, String)] =
    spark.read.json(dir).selectExpr("cast(type as string)", "obj")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

  test("framework run reproduces the hand-wired pipeline bit for bit") {
    val base = "target/etlfw-full"
    val cfg = Map("streetsPath" -> s"$Fx/streets.ndjson",
      "housesPath" -> s"$Fx/house_numbers.ndjson")
    val dirs = EtlFramework.run(EtlFramework.addressesModule, cfg, base,
      EtlFramework.Tools(spark))
    assert(dirs === Seq(s"$base/addresses/infer", s"$base/addresses/transform"))

    SpacetimeEtl.runPipeline(spark, s"$Fx/streets.ndjson",
      s"$Fx/house_numbers.ndjson", "target/etlfw-ref")
    val got = records(s"$base/addresses/transform/records")
    val want = records("target/etlfw-ref/records")
    assert(want.nonEmpty && got === want)
  }

  test("single-step run resolves previous from the declared order") {
    val base = "target/etlfw-full" // reuses the full run's infer output
    val cfg = Map.empty[String, String]
    val dirs = EtlFramework.run(EtlFramework.addressesModule, cfg, base,
      EtlFramework.Tools(spark), only = Some("transform"))
    assert(dirs === Seq(s"$base/addresses/transform"))
    assert(records(s"$base/addresses/transform/records")
      === records("target/etlfw-ref/records"))
  }

  test("dirs protocol: getDir resolves sibling modules; unknown step rejected") {
    val d = EtlFramework.Dirs("/base", "addresses", "infer", None)
    assert(d.current === "/base/addresses/infer")
    assert(d.getDir("nyc-streets", "transform")
      === "/base/nyc-streets/transform")
    val e = intercept[IllegalArgumentException] {
      EtlFramework.run(EtlFramework.addressesModule, Map.empty, "/tmp/x",
        EtlFramework.Tools(spark), only = Some("nope"))
    }
    assert(e.getMessage.contains("no step 'nope'"))
  }
}
