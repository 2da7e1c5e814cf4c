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

  test("native V2 sink twin: writeStream.format(graft-snap), exactly-once across restart") {
    // round 13: the same contract as s16, with NO foreachBatch — the
    // sink is a native StreamingWrite whose per-epoch commit carries
    // the exactly-once marker in the manifest itself (streamQuery/
    // streamEpoch meta), so the crash window between table commit and
    // checkpoint write cannot double-land a batch.
    import org.apache.spark.sql.streaming.Trigger
    val e = Tables(spark, TestSpark.Sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-v2sink").toString
    val (tableDir, inDir, cp) = (s"$tmp/table", s"$tmp/in", s"$tmp/cp")

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(e.schema).parquet(inDir)
        .writeStream.format("graft-snap")
        .option("path", tableDir).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: half A → one epoch, one commit
    e.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(inDir)
    runOnce()
    assert(SnapTable.latestVersion(spark, tableDir) == 1)
    assert(SnapTable.read(spark, tableDir).count() ==
      e.filter(col("event_id") % 2 === 0).count())
    val m1 = SnapTable.meta(spark, tableDir)
    assert(m1.contains("streamQuery") && m1("streamEpoch") == "0",
      s"epoch marker missing from the commit metadata: $m1")

    // restart from the same checkpoint: file A skipped, exactly one
    // new commit lands
    e.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(inDir)
    runOnce()
    assert(SnapTable.latestVersion(spark, tableDir) == 2)
    val got = SnapTable.read(spark, tableDir)
      .orderBy("event_id").collect().toSeq
    assert(got == e.orderBy("event_id").collect().toSeq,
      "restart must deliver every event exactly once")

    // a REPLAYED epoch is a no-op: the recovered batch's commit sees
    // its epoch at/below the table's last committed epoch and skips
    val write = new graft.sources.SnapStreamingWrite(tableDir, e.schema,
      SnapTable.meta(spark, tableDir)("streamQuery"))
    write.commit(1L, Array(graft.sources.SnapStreamFileMessage(None)))
    assert(SnapTable.latestVersion(spark, tableDir) == 2,
      "a replayed epoch must not commit a new version")

    // an empty run commits nothing (no version churn)
    runOnce()
    assert(SnapTable.latestVersion(spark, tableDir) == 2)

    // the native batch reader + the streamed table compose: the table
    // reads back through the connector identically
    assert(spark.read.format("graft-snap").load(tableDir).count() ==
      e.count())
  }
}
