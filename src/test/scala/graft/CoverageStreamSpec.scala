package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CoverageState, CovEvent, CovState}

/** S32 streaming interval-union coverage: the streamed per-event live
  * feed over a time-split input equals an INDEPENDENT declarative
  * three-window batch build row-for-row, the typed fold agrees, the
  * last emission per user reconciles with the s32_coveragestream
  * published relation — all across a checkpointed restart. */
class CoverageStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = Tables(spark, TestSpark.Sf, "events")
    .filter(col("user_id").isNotNull && col("ts").isNotNull)
    .select("user_id", "event_id", "ts")

  /** q113's run windows extended to a PER-EVENT live coverage: closed
    * prior runs (complete by the time a later run starts) + the open
    * run's extent so far. This is the declarative twin the stream's
    * five-long sweep state must reproduce. */
  private def liveBuild() = {
    val W = CoverageState.W
    val wPrev = Window.partitionBy("user_id")
      .orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("user_id")
      .orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val evr = ev
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("st"))
      .withColumn("en", col("st") + W)
      .withColumn("pmax", max(col("en")).over(wPrev))
      .withColumn("run", sum(
        when(col("pmax").isNull || col("st") > col("pmax"), 1L)
          .otherwise(0L)).over(wRun))
    val wRs = Window.partitionBy("user_id", "run")
    val wReLive = Window.partitionBy("user_id", "run")
      .orderBy(col("st"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wClosed = Window.partitionBy("user_id").orderBy("run")
      .rowsBetween(Window.unboundedPreceding, -1)
    val closed = evr.groupBy("user_id", "run")
      .agg((max(col("en")) - min(col("st"))).as("extent"))
      .withColumn("closed",
        coalesce(sum(col("extent")).over(wClosed), lit(0L)))
      .select("user_id", "run", "closed")
    evr
      .withColumn("rsr", min(col("st")).over(wRs))
      .withColumn("relive", max(col("en")).over(wReLive))
      .join(closed, Seq("user_id", "run"))
      .select(col("user_id"), col("event_id"), col("st"), col("run"),
        (col("closed") + col("relive") - col("rsr")).as("covered_live"))
  }

  test("streamed live coverage == window build == typed fold, across restart") {
    val expect = liveBuild().orderBy("user_id", "event_id").collect().toSeq
    assert(expect.nonEmpty)
    // the sweep must actually close runs somewhere or the union is
    // degenerate (everything one run / everything disjoint)
    val maxRun = expect.map(_.getLong(3)).max
    assert(maxRun >= 2L, "fixture never closes a run")
    assert(expect.exists(r => r.getLong(3) >= 2L && r.getLong(4) > 0L))

    val folded = CoverageState
      .coverageBatch(CoverageState.fromEvents(spark, ev))
      .toDF().orderBy("user_id", "event_id").collect().toSeq
    assert(folded == expect, s"fold ${folded.size} vs windows ${expect.size}")

    val tmp = java.nio.file.Files.createTempDirectory("graft-s32").toString
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
        .as[CovEvent]
      val q = CoverageState.coverageStreaming(src)
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
      .select("user_id", "event_id", "st", "run", "covered_live")
      .orderBy("user_id", "event_id").collect().toSeq
    assert(got == expect, s"streamed ${got.size} vs batch ${expect.size}")
    val keys = spark.read.parquet(outDir).select("event_id").collect()
      .map(_.getLong(0))
    assert(keys.distinct.length == keys.length)

    // last emission per user reconciles with the published s32 relation
    val lastByUser = expect.groupBy(_.getLong(0)).map { case (u, rows) =>
      val last = rows.maxBy(r => (r.getLong(2), r.getLong(1)))
      u -> ((last.getLong(3), last.getLong(4)))
    }
    val pub = SparkEntry.queries("s32_coveragestream")(spark, TestSpark.Sf)
      .collect()
    assert(pub.length == lastByUser.size)
    pub.foreach { r =>
      val (nRuns, covered) = lastByUser(r.getLong(0))
      assert(r.getLong(1) == nRuns, s"user ${r.getLong(0)}: n_runs")
      assert(r.getLong(3) == covered, s"user ${r.getLong(0)}: covered_us")
      assert(r.getLong(4) <= r.getLong(5))
    }
  }

  test("fold semantics: open, extend, close, state carries across batches") {
    import java.sql.Timestamp
    val W = CoverageState.W
    def t(us: Long) = {
      val ts = new Timestamp(us / 1000)
      ts.setNanos(((us % 1000000) * 1000).toInt)
      ts
    }
    def e(id: Long, us: Long) = CovEvent(7L, id, t(us))
    // open at 0; extend at W/2 (overlap); close + reopen at 3W
    val (r0, st0) = CoverageState.foldBatch(7L, None,
      Seq(e(1, 1000000L), e(2, 1000000L + W / 2), e(3, 1000000L + 3 * W)))
    assert(r0.map(_.run) == Seq(1L, 1L, 2L))
    assert(r0.map(_.covered_live) == Seq(W, W + W / 2, W + W / 2 + W))
    assert(st0 == CovState(1L, W + W / 2, 3L, 1000000L + 3 * W,
      1000000L + 4 * W))
    // state carries: an overlap of the open run only extends it
    val (r1, st1) = CoverageState.foldBatch(7L, Some(st0),
      Seq(e(4, 1000000L + 3 * W + 1)))
    assert(r1.map(_.run) == Seq(2L))
    assert(r1.head.covered_live == W + W / 2 + W + 1)
    assert(st1.runs == 1L && st1.events == 4L)
  }
}
