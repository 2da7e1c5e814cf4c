package graft

import graft.queries.{Llm, Relational, Streams}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class ApproxAndSinksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("t2 verdict rows: exact p50 matches q32, sketch within 5%") {
    val exact = Relational.queries("q32_quantile")(spark, TestSpark.Sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rows = Llm.queries("t2_approxq")(spark, TestSpark.Sf).collect()
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      assert(r.getDouble(1) === exact(r.getString(0)), s"p50_exact ${r.getString(0)}")
      assert(r.getBoolean(2), s"${r.getString(0)}: sketch out of 5% tolerance")
    }
    val t1 = Llm.queries("t1_approx")(spark, TestSpark.Sf).collect().head
    assert(t1.getBoolean(1), "t1 HLL out of 5% tolerance")
  }

  test("streaming writeStream file sink round-trips the tumbling agg") {
    val out = java.nio.file.Files.createTempDirectory("graft-stream-sink")
    val agg = Streams.readEvents(spark, TestSpark.Sf)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ts_bucket"), col("event_type"), col("n"))
    val q = agg.writeStream
      .format("parquet")
      .option("path", s"$out/data")
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // append mode only emits windows the watermark has closed; every
    // emitted row must match the batch aggregation exactly
    val batch = graft.queries.StreamingQueries.queries("s01_tumbling")(spark, TestSpark.Sf)
      .select("ts_bucket", "event_type", "n")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val emitted = spark.read.parquet(s"$out/data")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|"))
    assert(emitted.nonEmpty, "file sink emitted nothing")
    emitted.foreach(r => assert(batch.contains(r), s"spurious row $r"))
  }

  test("SURVEY.md and SparkEntry.queries agree on the declared key set") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/SURVEY.md")), "UTF-8")
    val keys = SparkEntry.queries.keySet
    // implemented → documented (by key name or its Qnn/Snn/Gnn/Tn alias)
    val alias = "([a-z]+)(\\d+[a-z]*)_.*".r
    keys.foreach { k =>
      val documented = survey.contains(k) || (k match {
        case alias(p, n) => survey.contains(p.toUpperCase + n.toUpperCase)
        case _ => false
      })
      assert(documented, s"query $k not documented in SURVEY.md")
    }
    // declared snake-case keys in SURVEY → implemented
    val declared = "\\b([qgst][dstm]?\\d+[a-z]*_[a-z0-9]+)\\b".r
      .findAllIn(survey).toSet
    val phantom = declared.filterNot(keys.contains)
    assert(phantom.isEmpty, s"SURVEY declares unimplemented keys: $phantom")
  }
}
