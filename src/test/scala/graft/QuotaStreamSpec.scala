package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{QuotaCount, QuotaEvent, QuotaState}

/** S25 streaming daily quota gate: the streamed admission feed over a
  * time-split input equals BOTH the typed batch fold and the
  * declarative window build (the oracle-gated batch form), across a
  * checkpointed restart; each admission emits exactly once. */
class QuotaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = Tables(spark, TestSpark.Sf, "events")
    .filter(col("user_id").isNotNull && col("ts").isNotNull)
    .select("user_id", "event_id", "ts")

  test("streamed admissions == batch window build across a checkpointed restart") {
    val expect = SparkEntry.queries("s25_quotagate")(spark, TestSpark.Sf)
      .collect().toSeq
    assert(expect.nonEmpty, "fixture must admit at least one event")
    // the gate must actually trim something, or the test is vacuous
    val total = ev.count()
    assert(expect.size < total, "quota must drop at least one event")
    val folded = QuotaState.admittedBatch(QuotaState.fromEvents(spark, ev))
      .toDF().orderBy("user_id", "day", "rk").collect().toSeq
    assert(folded == expect, s"fold ${folded.size} vs window ${expect.size}")

    val tmp = java.nio.file.Files.createTempDirectory("graft-s25").toString
    val (inDir, cp, outDir) = (s"$tmp/in", s"$tmp/cp", s"$tmp/out")
    val median = ev.select(expr(
      "percentile_approx(CAST(ts AS DOUBLE), 0.5, 10000)")).head().getDouble(0)
    val half = col("ts").cast("double") < median

    def runStream(): Unit = {
      val raw = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("ts", TimestampType)))
      import spark.implicits._
      val src = spark.readStream.schema(raw)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .as[QuotaEvent]
      val q = QuotaState.admittedStreaming(src)
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
      .select("user_id", "event_id", "day", "rk")
      .orderBy("user_id", "day", "rk").collect().toSeq
    assert(got == expect, s"streamed ${got.size} vs batch ${expect.size}")
    // exactly-once: an event admits at most once
    val keys = spark.read.parquet(outDir).select("event_id").collect()
      .map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
  }

  test("fold semantics: cap per day, counter resets on day rollover, state carries") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    def e(id: Long, sec: Long) = QuotaEvent(7L, id, t(sec))
    val day0 = 0L // epoch day of t(1..)
    // 5 events on day 0: first 3 admit, 2 drop
    val (a0, st0) = QuotaState.foldBatch(7L, None, (1L to 5L).map(i => e(i, i * 10)))
    assert(a0.map(_.event_id) == Seq(1L, 2L, 3L))
    assert(a0.map(_.rk) == Seq(1L, 2L, 3L))
    assert(st0 == QuotaCount(day0, 3L))
    // same day, new batch: state says the day is full — nothing admits
    val (a1, st1) = QuotaState.foldBatch(7L, Some(st0), Seq(e(9, 100)))
    assert(a1.isEmpty && st1 == st0)
    // next day: counter resets, admission resumes
    val (a2, st2) = QuotaState.foldBatch(7L, Some(st1), Seq(e(10, 86400 + 5)))
    assert(a2.map(_.event_id) == Seq(10L))
    assert(st2 == QuotaCount(1L, 1L))
    // intra-batch sort: late-listed but earlier-timestamped event ranks first
    val (a3, _) = QuotaState.foldBatch(8L, None, Seq(e(21, 50), e(20, 40)))
    assert(a3.map(_.event_id) == Seq(20L, 21L))
  }

  test("fold contract: a cross-batch day REGRESSION fails loudly, never reopens the quota") {
    import java.sql.Timestamp
    def e(id: Long, sec: Long) = QuotaEvent(7L, id, new Timestamp(sec * 1000L))
    // state advanced to day 1; a late event from day 0 arrives in a
    // later micro-batch — silently resetting would reopen day 0's quota
    val st = QuotaCount(1L, 3L)
    val ex = intercept[IllegalStateException] {
      QuotaState.foldBatch(7L, Some(st), Seq(e(99, 100)))
    }
    assert(ex.getMessage.contains("out-of-order"))
    // forward-day events still fold normally from that state
    val (a, st2) = QuotaState.foldBatch(7L, Some(st), Seq(e(100, 2 * 86400 + 5)))
    assert(a.map(_.event_id) == Seq(100L) && st2 == QuotaCount(2L, 1L))
  }
}
