package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Streams

/** S38 streaming FDR screen: the per-(type, day) cent state folded
  * micro-batch by micro-batch equals the one-pass batch build for a
  * split that cuts DAYS' event sets across batches (the case where
  * folding binned totals — instead of raw cents — would be wrong,
  * since (a+b) div 1000 ≠ a div 1000 + b div 1000), asserted through
  * q149's identical fdrScreen read path across a checkpointed
  * restart. */
class FdrStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(rs: Array[Row]): Seq[(String, String, Long, Long,
      Long, Long, Long, Boolean)] =
    rs.map(r => (r.getString(0), String.valueOf(r.get(1)), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getBoolean(7))).toSeq

  test("streamed day-cent fold == q149 batch build across a restart") {
    val s = spark
    val expect = rows(
      SparkEntry.queries("q149_bhfdr")(s, TestSpark.Sf).collect())

    val ev = Tables(s, TestSpark.Sf, "events")
      .select("event_id", "event_type", "ts", "value")
    // event_id parity splits WITHIN days: both halves carry partial
    // cent sums for the same (type, day) keys — the binned-total trap
    val half = col("event_id") % 2 === 0
    val tmp = java.nio.file.Files.createTempDirectory("graft-s38").toString
    val (inDir, stDir, cp) = (s"$tmp/in", s"$tmp/st", s"$tmp/cp")

    ev.filter(half).drop("event_id").coalesce(1).write.parquet(inDir)
    Streams.s38(s, inDir, stDir, cp)
    val mid = rows(Streams.s38Result(s, stDir).collect())
    assert(mid.nonEmpty && mid != expect,
      "half-fed state already equals the full answer — split is vacuous")

    ev.filter(!half).drop("event_id").coalesce(1).write.mode("append")
      .parquet(inDir)
    Streams.s38(s, inDir, stDir, cp)

    val got = rows(Streams.s38Result(s, stDir).collect())
    assert(got === expect,
      "streamed FDR state diverged from the batch build")
    // the decision column must be the NULL-data contract, not noise
    assert(got.forall(!_._8))
  }
}
