package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streams

/** S33 streaming join-cardinality statistics: the per-side (sketch,
  * count) rows folded micro-batch by micro-batch (elementwise + scalar
  * addition) equal the one-pass batch build for ANY batch split —
  * asserted through q135's identical estimator read path, across a
  * checkpointed restart. */
class CardStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def row(rs: Array[Row]) = {
    assert(rs.length == 1)
    (0 until 10).map(rs.head.getLong)
  }

  test("streamed stats fold == batch build across a checkpointed restart") {
    val s = spark
    val expect = row(
      SparkEntry.queries("q135_joincard")(s, TestSpark.Sf).collect())

    val li = Tables(s, TestSpark.Sf, "lineitem")
      .select("l_partkey", "l_quantity")
    val half = col("l_partkey") % 2 === 0
    val tmp = java.nio.file.Files.createTempDirectory("graft-s33").toString
    val (inDir, stDir, cp) = (s"$tmp/in", s"$tmp/st", s"$tmp/cp")

    li.filter(half).coalesce(1).write.parquet(inDir)
    Streams.s33(s, inDir, stDir, cp)
    val gens1 = new java.io.File(stDir).listFiles()
      .map(_.getName).count(_.startsWith("gen="))
    assert(gens1 >= 1)

    // RESTART with the second half staged: the checkpoint skips the
    // already-folded file; the stats keep folding from the last gen
    li.filter(!half).coalesce(1).write.mode("append").parquet(inDir)
    Streams.s33(s, inDir, stDir, cp)
    val gens2 = new java.io.File(stDir).listFiles()
      .map(_.getName).count(_.startsWith("gen="))
    assert(gens2 > gens1, "restart must fold a new generation")

    val got = row(Streams.s33Result(s, TestSpark.Sf, stDir).collect())
    assert(got === expect,
      "streamed stats estimate diverged from the batch build")
    // the estimate the planner would read is sound on the full data
    assert(got(9) == 1L)
  }
}
