package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EwmaEvent, EwmaState}

/** S30 streaming EWMA: the bounded-ring fold equals q79's batch window
  * build, and the streamed feed equals both across a checkpointed
  * restart with exactly-once emission. */
class EwmaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev = Tables(spark, TestSpark.Sf, "events")
    .filter(col("ts").isNotNull)
    .select("user_id", "event_id", "ts", "value")

  test("typed ring fold == q79 window build; streamed == both across a restart") {
    val s = spark
    import s.implicits._
    // full (un-limited) window build — the reference semantics
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val num = (1 to 7).map(k =>
        coalesce(lag(col("x"), k).over(w), lit(0L)) * lit(1L << (7 - k)))
      .foldLeft(col("x") * lit(128L))(_ + _)
    val build = ev
      .withColumn("x", floor(col("value")).cast(LongType))
      .select(col("user_id"), col("event_id"), col("x"),
        (num.cast(DoubleType) / lit(256.0)).as("ewma"))
      .orderBy("user_id", "event_id")
    val expect = build.collect().toSeq
    assert(expect.nonEmpty)

    // the fixture has no NULL metrics — exercise the sentinel path by
    // hand: a NULL event emits NULL, and later events consume it as 0
    // (q79's COALESCE(LAG(x), 0) semantics)
    {
      import java.sql.Timestamp
      def e(id: Long, sec: Long, v: Option[Double]) =
        EwmaEvent(1L, id, new Timestamp(sec * 1000L), v)
      val (rows, ring) = EwmaState.foldBatch(1L, None,
        Seq(e(1, 10, Some(4.0)), e(2, 20, None), e(3, 30, Some(8.0))))
      assert(rows(1).ewma.isEmpty, "a NULL metric's own ewma must be NULL")
      // event 3: 8*128 + 0*64 (null lag) + 4*32 = 1152 -> 4.5
      assert(rows(2).ewma.contains(1152.0 / 256.0))
      assert(ring.h == Seq(8L, EwmaState.NullX, 4L))
    }
    val ds = ev.as[EwmaEvent]
    val oneShot = ds.groupByKey(_.user_id)
      .flatMapGroups((uid: Long, it: Iterator[EwmaEvent]) =>
        EwmaState.foldBatch(uid, None, it.toSeq)._1.iterator)
      .toDF("user_id", "event_id", "x", "ewma")
      .orderBy("user_id", "event_id").collect().toSeq
    assert(oneShot == expect, s"fold ${oneShot.size} vs window ${expect.size}")

    // streamed across a checkpointed restart (median time split)
    val tmp = java.nio.file.Files.createTempDirectory("graft-s30").toString
    val (inDir, cp, outDir) = (s"$tmp/in", s"$tmp/cp", s"$tmp/out")
    val median = ev.select(expr(
      "percentile_approx(CAST(ts AS DOUBLE), 0.5, 10000)")).head().getDouble(0)
    val half = col("ts").cast("double") < median

    def runStream(): Unit = {
      val raw = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("ts", TimestampType), StructField("value", DoubleType)))
      val src = s.readStream.schema(raw)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .as[EwmaEvent]
      val q = EwmaState.streamed(src)
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

    val got = s.read.parquet(outDir)
      .select("user_id", "event_id", "x", "ewma")
      .orderBy("user_id", "event_id").collect().toSeq
    assert(got == expect, s"streamed ${got.size} vs batch ${expect.size}")
    val ids = got.map(_.getLong(1))
    assert(ids.distinct.size == ids.size, "an event must emit exactly once")
  }
}
