package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streams

/** S31 streaming Count-Min maintenance: the sketch folded micro-batch
  * by micro-batch (elementwise addition, the CMS merge) equals the
  * one-pass batch build for ANY batch split — asserted through t5's
  * identical estimator read path, across a checkpointed restart. */
class CmsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(rs: Array[Row]) =
    rs.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("streamed CMS fold == batch sketch across a checkpointed restart") {
    val s = spark
    val expect = rows(
      SparkEntry.queries("t5_cms")(s, TestSpark.Sf).collect())
    graft.operators.OpCaches.releaseAll()
    assert(expect.size == 10)

    val docs = Tables(s, TestSpark.Sf, "documents")
    val half = col("doc_id") % 2 === 0
    val tmp = java.nio.file.Files.createTempDirectory("graft-s31").toString
    val (inDir, skDir, cp) = (s"$tmp/in", s"$tmp/sk", s"$tmp/cp")

    docs.filter(half).coalesce(1).write.parquet(inDir)
    Streams.s31(s, inDir, skDir, cp)
    // one generation per micro-batch so far
    val gens1 = new java.io.File(skDir).listFiles()
      .map(_.getName).count(_.startsWith("gen="))
    assert(gens1 >= 1)

    // RESTART with the second half staged: the checkpoint skips the
    // already-folded file, the sketch keeps folding from its last
    // generation
    docs.filter(!half).coalesce(1).write.mode("append").parquet(inDir)
    Streams.s31(s, inDir, skDir, cp)
    val gens2 = new java.io.File(skDir).listFiles()
      .map(_.getName).count(_.startsWith("gen="))
    assert(gens2 > gens1, "restart must fold a new generation")

    val got = rows(Streams.s31Result(s, TestSpark.Sf, skDir).collect())
    assert(got === expect,
      "streamed sketch estimates diverged from the batch build")
  }
}
