package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streams

/** S37 streaming K-arm monitor: the SAME per-(type, user) cent state
  * the s36 fold maintains, read through q147's identical anovaStats F
  * trees, equals the one-pass batch build across a checkpointed
  * restart that splits users' event sets across batches (the trap a
  * test-sums fold fails — Σv² is nonlinear in per-user partials).
  * Also pins the "one state, many statistics" claim: the Welch read
  * path over the very same final generation still matches q144. */
class AnovaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(rs: Array[Row]): Seq[(String, Seq[Long],
      Option[Double])] =
    rs.map(r => (r.getString(0),
      (1 to 13).map(r.getLong(_)).toSeq,
      if (r.isNullAt(14)) None else Some(r.getDouble(14)))).toSeq

  test("streamed cent fold read via anovaStats == q147 batch build") {
    val s = spark
    val expect = rows(
      SparkEntry.queries("q147_anova")(s, TestSpark.Sf).collect())

    val ev = Tables(s, TestSpark.Sf, "events")
      .select("event_id", "event_type", "user_id", "value")
    val half = col("event_id") % 2 === 0
    val tmp = java.nio.file.Files.createTempDirectory("graft-s37").toString
    val (inDir, stDir, cp) = (s"$tmp/in", s"$tmp/st", s"$tmp/cp")

    ev.filter(half).drop("event_id").coalesce(1).write.parquet(inDir)
    Streams.s36(s, inDir, stDir, cp)
    val mid = rows(Streams.s37Result(s, stDir).collect())
    assert(mid.nonEmpty && mid != expect,
      "half-fed state already equals the full answer — split is vacuous")

    ev.filter(!half).drop("event_id").coalesce(1).write.mode("append")
      .parquet(inDir)
    Streams.s36(s, inDir, stDir, cp)

    val got = rows(Streams.s37Result(s, stDir).collect())
    assert(got === expect,
      "streamed ANOVA state diverged from the batch build")
    assert(got.exists(_._3.isDefined), "no computable F — gate is vacuous")

    // one state, many statistics: the SAME final generation read
    // through the Welch trees still matches q144's batch build
    val welchGot = Streams.s36Result(s, stDir).collect()
      .map(String.valueOf(_)).toSeq
    val welchExpect = SparkEntry.queries("q144_welch")(s, TestSpark.Sf)
      .collect().map(String.valueOf(_)).toSeq
    assert(welchGot === welchExpect)
  }
}
