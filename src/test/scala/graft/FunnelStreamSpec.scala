package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.FunnelState

/** S19 streaming funnel detection: streamed conversions over a
  * time-split feed equal the batch fold, across a checkpointed
  * restart; a conversion emits exactly once. */
class FunnelStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = Tables(spark, TestSpark.Sf, "events")
    .filter(col("user_id").isNotNull && col("ts").isNotNull
      && col("event_type").isin("view", "click", "purchase"))
    .select("user_id", "event_type", "ts", "event_id")

  test("streamed conversions == batch fold across a checkpointed restart") {
    val expect = FunnelState.conversionsBatch(
        FunnelState.fromEvents(spark, ev))
      .toDF().orderBy("user_id").collect().toSeq
    assert(expect.nonEmpty, "fixture must contain completed funnels")

    val tmp = java.nio.file.Files.createTempDirectory("graft-s19").toString
    val (inDir, cp, outDir) = (s"$tmp/in", s"$tmp/cp", s"$tmp/out")
    // time-split feed: batch A strictly before the median, batch B after
    val median = ev.select(expr(
      "percentile_approx(CAST(ts AS DOUBLE), 0.5, 10000)")).head().getDouble(0)
    val half = col("ts").cast("double") < median

    def runStream(): Unit = {
      val raw = StructType(Seq(
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("ts", TimestampType), StructField("event_id", LongType)))
      import spark.implicits._
      val src = spark.readStream.schema(raw)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .as[graft.streaming.FunnelEvent]
      val q = FunnelState.conversionsStreaming(src)
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
      .select("user_id", "t1", "t2", "t3").orderBy("user_id")
      .collect().toSeq
    assert(got == expect.map(r => r), s"streamed ${got.size} vs batch ${expect.size}")
    // exactly-once: no user converts twice
    assert(got.map(_.getLong(0)).distinct.size == got.size)
  }

  test("fold semantics: strict-after stages, single emission, order-insensitive within batch") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    def e(ty: String, sec: Long, id: Long) =
      graft.streaming.FunnelEvent(1L, ty, t(sec), id)
    // click at the same instant as the view must NOT qualify (strict >)
    val (none, _) = FunnelState.foldBatch(1L, None,
      Seq(e("view", 10, 1), e("click", 10, 2), e("purchase", 20, 3)))
    assert(none.isEmpty)
    // shuffled arrival within one batch sorts by event time
    val (conv, st) = FunnelState.foldBatch(1L, None,
      Seq(e("purchase", 30, 3), e("view", 10, 1), e("click", 20, 2),
        e("purchase", 40, 4)))
    assert(conv.map(c => (c.t1, c.t2, c.t3)) == Seq((t(10), t(20), t(30))))
    assert(st.done)
    // a done user never emits again
    val (again, _) = FunnelState.foldBatch(1L, Some(st),
      Seq(e("purchase", 50, 5)))
    assert(again.isEmpty)
    // cross-batch: stage 2 completes from prior state
    val (_, open) = FunnelState.foldBatch(2L, None, Seq(e("view", 10, 1)))
    val (c2, _) = FunnelState.foldBatch(2L, Some(open),
      Seq(e("click", 20, 2), e("purchase", 25, 3)))
    assert(c2.size == 1 && c2.head.t3 == t(25))
  }
}
