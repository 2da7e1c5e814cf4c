package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AnomEvent, AnomMoments, AnomState}

/** S21 streaming anomaly detection: the streamed hit feed over a
  * time-split input equals BOTH the typed batch fold and the
  * declarative window build (the oracle-gated batch form), across a
  * checkpointed restart; each hit emits exactly once. */
class AnomStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = Tables(spark, TestSpark.Sf, "events")
    .filter(col("user_id").isNotNull && col("ts").isNotNull)
    .select("user_id", "event_id", "ts", "value")

  test("streamed anomalies == batch window build across a checkpointed restart") {
    val expect = SparkEntry.queries("s21_anomstream")(spark, TestSpark.Sf)
      .collect().toSeq
    assert(expect.nonEmpty, "fixture must flag at least one anomaly")
    val folded = AnomState.anomaliesBatch(AnomState.fromEvents(spark, ev))
      .toDF().orderBy("user_id", "event_id").collect().toSeq
    assert(folded == expect, s"fold ${folded.size} vs window ${expect.size}")

    val tmp = java.nio.file.Files.createTempDirectory("graft-s21").toString
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
        .as[AnomEvent]
      val q = AnomState.anomaliesStreaming(src)
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
      .select("user_id", "event_id", "x", "n_prior")
      .orderBy("user_id", "event_id").collect().toSeq
    assert(got == expect, s"streamed ${got.size} vs batch ${expect.size}")
    // exactly-once: an event flags at most once
    val keys = spark.read.parquet(outDir).select("event_id").collect()
      .map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
  }

  test("fold semantics: prior-prefix scoring, state carries across batches") {
    import java.sql.Timestamp
    def t(sec: Long) = new Timestamp(sec * 1000L)
    def e(id: Long, sec: Long, v: Double) = AnomEvent(7L, id, t(sec), Some(v))
    // 8 calm observations (x = 100 each) build history; no scoring yet
    val calm = (1L to 8L).map(i => e(i, i * 10, 1.0))
    val (hits0, st0) = AnomState.foldBatch(7L, None, calm)
    assert(hits0.isEmpty)
    assert(st0 == AnomMoments(8L, 800L, 80000L))
    // zero variance prior: ANY deviation flags (dev² > 0)
    val (hits1, st1) = AnomState.foldBatch(7L, Some(st0), Seq(e(9, 90, 1.01)))
    assert(hits1.map(h => (h.event_id, h.x, h.n_prior)) == Seq((9L, 101L, 8L)))
    // an identical value does NOT flag (dev = 0 is not > 0)
    val (hits2, _) = AnomState.foldBatch(7L, Some(st0), Seq(e(9, 90, 1.0)))
    assert(hits2.isEmpty)
    // within-batch arrival order is event-time, not input order; the
    // anomaly itself joins the state for later rows
    val (hits3, st3) = AnomState.foldBatch(7L, Some(st1),
      Seq(e(11, 110, 1.0), e(10, 100, 50.0)))
    assert(hits3.map(_.event_id) == Seq(10L))
    assert(st3.n == 11L)
  }
}
