package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapTable
import graft.queries.Streams

/** S16 snapshot-table streaming sink: one atomic commit per micro-batch,
  * checkpointed restart skips processed files, and the batchId guard
  * makes a re-delivered batch a no-op (exactly-once into the table). */
class SnapSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed commits == batch replay across a checkpointed restart; replays skipped") {
    val e = Tables(spark, TestSpark.Sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-s16").toString
    val (tableDir, inDir, cp) = (s"$tmp/table", s"$tmp/in", s"$tmp/cp")

    // run 1: only half A staged — one micro-batch, one commit
    e.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(inDir)
    Streams.s16(spark, tableDir, inDir, cp)
    assert(SnapTable.latestVersion(spark, tableDir) == 1)
    // table is readable mid-stream at the committed version
    assert(SnapTable.read(spark, tableDir).count() ==
      e.filter(col("event_id") % 2 === 0).count())

    // RESTART: stage half B, same checkpoint — file A must be skipped,
    // exactly one new commit lands
    e.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(inDir)
    Streams.s16(spark, tableDir, inDir, cp)
    assert(SnapTable.latestVersion(spark, tableDir) == 2)
    assert(SnapTable.meta(spark, tableDir)("batchId") == "1")

    // final state == all events, each exactly once
    val got = SnapTable.read(spark, tableDir)
      .orderBy("event_id").collect().toSeq
    val expect = e.orderBy("event_id").collect().toSeq
    assert(got == expect)

    // crash-replay guard: re-presenting an already-committed batch id
    // is a no-op — no new version, state unchanged
    val replay = e.filter(col("event_id") % 2 === 1)
    assert(!Streams.s16CommitBatch(spark, tableDir, replay, 1L))
    assert(SnapTable.latestVersion(spark, tableDir) == 2)
    // and a genuinely new batch id still commits
    assert(Streams.s16CommitBatch(spark, tableDir,
      replay.limit(0), 2L))
    assert(SnapTable.latestVersion(spark, tableDir) == 3)
  }
}
