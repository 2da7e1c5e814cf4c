package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BalanceState, BalEvent, BalMoments}

/** S26 streaming clamped balance: the streamed per-event balance feed
  * over a time-split input equals q112's two-window batch build
  * row-for-row, its last-emission-per-user state equals the
  * s26_balancestream published relation, and the typed fold agrees —
  * all across a checkpointed restart. */
class BalanceStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = Tables(spark, TestSpark.Sf, "events")
    .filter(col("user_id").isNotNull && col("ts").isNotNull
      && col("value").isNotNull
      && col("event_type").isin("click", "purchase"))
    .select("user_id", "event_id", "ts", "event_type", "value")

  test("streamed balances == q112 window build and s26 final state, across restart") {
    val expect = SparkEntry.queries("q112_clampedbalance")(spark, TestSpark.Sf)
      .collect().toSeq
    assert(expect.nonEmpty)
    // the clamp must actually fire somewhere or the identity is untested
    val clamped = expect.count(r => r.getLong(4) != r.getLong(3))
    assert(clamped > 0, "fixture must clamp at least one balance")
    val folded = BalanceState.balancesBatch(BalanceState.fromEvents(spark, ev))
      .toDF().orderBy("user_id", "event_id").collect().toSeq
    assert(folded == expect, s"fold ${folded.size} vs window ${expect.size}")

    val tmp = java.nio.file.Files.createTempDirectory("graft-s26").toString
    val (inDir, cp, outDir) = (s"$tmp/in", s"$tmp/cp", s"$tmp/out")
    val median = ev.select(expr(
      "percentile_approx(CAST(ts AS DOUBLE), 0.5, 10000)")).head().getDouble(0)
    val half = col("ts").cast("double") < median

    def runStream(): Unit = {
      val raw = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("ts", TimestampType), StructField("event_type", StringType),
        StructField("value", DoubleType)))
      import spark.implicits._
      val src = spark.readStream.schema(raw)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .as[BalEvent]
      val q = BalanceState.balancesStreaming(src)
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
    ev.filter(!half).coalesce(1).write.mode("append").parquet(inDir)
    runStream()

    val got = spark.read.parquet(outDir)
      .select("user_id", "event_id", "x", "s", "balance")
      .orderBy("user_id", "event_id").collect().toSeq
    assert(got == expect, s"streamed ${got.size} vs batch ${expect.size}")
    // exactly-once: one balance per event
    val keys = spark.read.parquet(outDir).select("event_id").collect()
      .map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
    // the oracle-gated s26 relation aggregates exactly these rows, so
    // row-for-row equality above also pins the published final states
  }

  test("fold semantics: clamp at zero, identity S - min(0, minS), state carries") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    def e(id: Long, sec: Long, typ: String, v: Double) =
      BalEvent(7L, id, t(sec), typ, Some(v))
    // +500, -1000 (clamps to 0), +300
    val (r0, st0) = BalanceState.foldBatch(7L, None, Seq(
      e(1, 10, "click", 5.0), e(2, 20, "purchase", 10.0),
      e(3, 30, "click", 3.0)))
    assert(r0.map(_.balance) == Seq(500L, 0L, 300L))
    assert(st0 == BalMoments(-200L, -500L))
    // state carries: another +100 lands on balance 400
    val (r1, _) = BalanceState.foldBatch(7L, Some(st0),
      Seq(e(4, 40, "click", 1.0)))
    assert(r1.map(_.balance) == Seq(400L))
  }
}
