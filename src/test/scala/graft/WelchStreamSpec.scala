package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streams

/** S36 streaming A/B monitor: the per-(type, user) cent state folded
  * micro-batch by micro-batch equals the one-pass batch build for a
  * split that deliberately cuts USERS' event sets across batches (the
  * case where folding the six TEST sums — instead of the per-user
  * cents — would be wrong, since Σv² is nonlinear in a user's
  * partials), asserted through q144's identical t/df read path across
  * a checkpointed restart. */
class WelchStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(rs: Array[Row]): Seq[(String, Long, Long, Long, Long,
      Long, Long, Option[Double], Option[Double])] =
    rs.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6),
      if (r.isNullAt(7)) None else Some(r.getDouble(7)),
      if (r.isNullAt(8)) None else Some(r.getDouble(8)))).toSeq

  test("streamed cent fold == batch build across a checkpointed restart") {
    val s = spark
    val expect = rows(
      SparkEntry.queries("q144_welch")(s, TestSpark.Sf).collect())

    val ev = Tables(s, TestSpark.Sf, "events")
      .select("event_id", "event_type", "user_id", "value")
    // event_id parity splits WITHIN users: both halves carry partial
    // cent sums for the same (type, user) keys — the merge-order trap
    // a test-sums fold would fail
    val half = col("event_id") % 2 === 0
    val tmp = java.nio.file.Files.createTempDirectory("graft-s36").toString
    val (inDir, stDir, cp) = (s"$tmp/in", s"$tmp/st", s"$tmp/cp")

    ev.filter(half).drop("event_id").coalesce(1).write.parquet(inDir)
    Streams.s36(s, inDir, stDir, cp)
    val gens1 = new java.io.File(stDir).listFiles()
      .map(_.getName).count(_.startsWith("gen="))
    assert(gens1 >= 1)
    // mid-stream the statistic is computable but must differ from the
    // final one (the state really is partial)
    val mid = rows(Streams.s36Result(s, stDir).collect())
    assert(mid.nonEmpty && mid != expect,
      "half-fed state already equals the full answer — split is vacuous")

    // RESTART with the second half staged: the checkpoint skips the
    // already-folded file; the cents keep folding from the last gen
    ev.filter(!half).drop("event_id").coalesce(1).write.mode("append")
      .parquet(inDir)
    Streams.s36(s, inDir, stDir, cp)
    val gens2 = new java.io.File(stDir).listFiles()
      .map(_.getName).count(_.startsWith("gen="))
    assert(gens2 > gens1, "restart must fold a new generation")

    val got = rows(Streams.s36Result(s, stDir).collect())
    assert(got === expect,
      "streamed Welch state diverged from the batch build")
    assert(got.exists(_._8.isDefined), "no computable t — gate is vacuous")
  }
}
