package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Scd2State

/** S20 streaming SCD2 apply: the streamed closed-row feed over a
  * time-split input equals BOTH the typed batch fold and the
  * declarative window build (the oracle-gated batch form), across a
  * checkpointed restart; a version row closes exactly once. */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = Tables(spark, TestSpark.Sf, "events")
    .filter(col("user_id").isNotNull && col("ts").isNotNull)
    .select("user_id", "event_id", "ts", "value")

  test("streamed closed rows == batch window build across a checkpointed restart") {
    val expect = SparkEntry.queries("s20_scd2stream")(spark, TestSpark.Sf)
      .collect().toSeq
    assert(expect.nonEmpty, "fixture must close at least one version row")
    // the typed fold agrees with the declarative window form
    val folded = Scd2State.closedRowsBatch(Scd2State.fromEvents(spark, ev))
      .toDF().orderBy("user_id", "version").limit(2000).collect().toSeq
    assert(folded == expect, s"fold ${folded.size} vs window ${expect.size}")

    val tmp = java.nio.file.Files.createTempDirectory("graft-s20").toString
    val (inDir, cp, outDir) = (s"$tmp/in", s"$tmp/cp", s"$tmp/out")
    val median = ev.select(expr(
      "percentile_approx(CAST(ts AS DOUBLE), 0.5, 10000)")).head().getDouble(0)
    val half = col("ts").cast("double") < median

    def runStream(): Unit = {
      val raw = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("ts", TimestampType), StructField("value", DoubleType)))
      import spark.implicits._
      val src = spark.readStream.schema(raw)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .as[graft.streaming.Scd2Event]
      val q = Scd2State.closedRowsStreaming(src)
        .toDF()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    ev.filter(half).coalesce(1).write.parquet(inDir)
    runStream()
    // RESTART with the second half staged: checkpoint skips file A
    ev.filter(!half).coalesce(1).write.mode("append").parquet(inDir)
    runStream()

    val got = spark.read.parquet(outDir)
      .select("user_id", "version", "attr", "valid_from", "valid_to")
      .orderBy("user_id", "version").limit(2000).collect().toSeq
    assert(got == expect, s"streamed ${got.size} vs batch ${expect.size}")
    // exactly-once: (user, version) closes at most once
    val keys = spark.read.parquet(outDir)
      .select("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("fold semantics: versions chain, attr rides, open row stays in state") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    def e(id: Long, sec: Long, v: Double) =
      graft.streaming.Scd2Event(7L, id, t(sec), Some(v))
    // shuffled arrival within one batch sorts by event time
    val (closed, open) = Scd2State.foldBatch(7L, None,
      Seq(e(3, 30, 3.9), e(1, 10, 1.2), e(2, 20, 2.5)))
    assert(closed.map(c => (c.version, c.attr, c.valid_from, c.valid_to)) ==
      Seq((1L, Some(1L), 10000000L, 20000000L),
        (2L, Some(2L), 20000000L, 30000000L)))
    assert(open.contains(graft.streaming.Scd2Open(3L, Some(3L), 30000000L)))
    // a later batch resumes from the open row — versions keep chaining
    val (closed2, open2) = Scd2State.foldBatch(7L, open, Seq(e(4, 40, -0.5)))
    assert(closed2.map(c => (c.version, c.valid_to)) == Seq((3L, 40000000L)))
    assert(open2.contains(graft.streaming.Scd2Open(4L, Some(-1L), 40000000L)))
  }
}
