package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streams

/** S35 streaming theta-sketch maintenance: the bottom-k sketch folded
  * micro-batch by micro-batch (union-and-trim, the KMV merge) equals
  * the one-pass batch build for ANY batch split — asserted through
  * t6's identical pair-algebra read path, across a checkpointed
  * restart. */
class ThetaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(rs: Array[Row]) =
    rs.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
      r.getDouble(9), r.getDouble(10), r.getDouble(11))).toSeq

  test("streamed union-and-trim fold == batch bottom-k sketch across a checkpointed restart") {
    val s = spark
    val expect = rows(
      SparkEntry.queries("t6_theta")(s, TestSpark.Sf).collect())
    graft.operators.OpCaches.releaseAll()
    assert(expect.nonEmpty)
    assert(expect.exists(_._7 === 256L),
      "no sketch trimmed — the merge path under test is vacuous")

    val li = Tables(s, TestSpark.Sf, "lineitem")
      .select("l_returnflag", "l_partkey", "l_suppkey")
    val half = col("l_partkey") % 2 === 0
    val tmp = java.nio.file.Files.createTempDirectory("graft-s35").toString
    val (inDir, skDir, cp) = (s"$tmp/in", s"$tmp/sk", s"$tmp/cp")

    li.filter(half).coalesce(1).write.parquet(inDir)
    Streams.s35(s, inDir, skDir, cp)
    val gens1 = new java.io.File(skDir).listFiles()
      .map(_.getName).count(_.startsWith("gen="))
    assert(gens1 >= 1)

    // RESTART with the second half staged: the checkpoint skips the
    // already-folded file; the sketch keeps folding by union-and-trim
    li.filter(!half).coalesce(1).write.mode("append").parquet(inDir)
    Streams.s35(s, inDir, skDir, cp)
    val gens2 = new java.io.File(skDir).listFiles()
      .map(_.getName).count(_.startsWith("gen="))
    assert(gens2 > gens1, "restart must fold a new generation")

    val got = rows(Streams.s35Result(s, TestSpark.Sf, skDir).collect())
    graft.operators.OpCaches.releaseAll()
    assert(got === expect,
      "streamed theta sketches diverged from the batch build")
  }
}
