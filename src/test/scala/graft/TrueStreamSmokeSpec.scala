package graft

import java.sql.Timestamp

import graft.streaming.{EwmaEvent, EwmaState}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** TRUE-streaming smoke (round-10 verdict item 6): every s-suite gate
  * proves batch ↔ AvailableNow-replay agreement, which exercises the
  * stateful operators under ONE synthetic micro-batch per file. This
  * spec drives a GroupState operator (EwmaState — the bounded-ring
  * state shape) from the RATE source under a real ProcessingTime
  * trigger: many micro-batches land at wall-clock cadence, state
  * carries across them with the engine's own commit/checkpoint timing,
  * and the run is stopped mid-stream (no drain barrier). Determinism
  * under nondeterministic batching comes from the operator's any-split
  * fold equality (FoldSplitPropSpec): committed batches cover a
  * contiguous prefix of the rate sequence, so the emitted set must be
  * exactly that prefix and every emitted ewma must equal a local
  * replay of the prefix. NOT an oracle query — a CI smoke for the
  * GroupState paths under real micro-batch timing. */
class TrueStreamSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("rate-source ProcessingTime stream: GroupState folds a contiguous prefix") {
    import spark.implicits._
    val users = 4L
    // event time is a PURE function of the rate value (never wall
    // clock), so the expected fold is reproducible after the fact;
    // +1 day so no event lands exactly on the initial watermark
    val base = 86400000L
    val events = spark.readStream.format("rate")
      .option("rowsPerSecond", 500)
      .option("numPartitions", 2)
      .load()
      .select(
        (col("value") % users).as("user_id"),
        col("value").as("event_id"),
        timestamp_millis(lit(base) + col("value") * 1000L).as("ts"),
        // a null metric every 7th event keeps the NullX sentinel hot
        when(col("value") % 7 =!= 0, (col("value") % 97).cast("double"))
          .as("value"))
      .as[EwmaEvent]

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-truestream").toString
    val q = EwmaState.streamed(events).writeStream
      .format("memory").queryName("true_stream_smoke")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      // wait until several micro-batches have committed output
      val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
      def emitted(): Long =
        spark.table("true_stream_smoke").count()
      var batches = 0L
      while ((emitted() < 200 ||
        { batches = q.recentProgress.count(_.numInputRows > 0); batches < 3 })
        && System.nanoTime() < deadline) Thread.sleep(200)
      assert(emitted() >= 200 && batches >= 3,
        s"stream made no progress: rows=${emitted()} batches=$batches " +
          s"(state=${q.status})")
    } finally q.stop()

    val out = spark.table("true_stream_smoke")
      .select("user_id", "event_id", "x", "ewma").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.nonEmpty)

    // committed batches cover a contiguous rate prefix [0, maxId]
    val maxId = out.map(_._2).max
    val ids = out.map(_._2).sorted.toSeq
    assert(ids == (0L to maxId),
      "emitted event_ids are not the contiguous committed prefix")

    // every emitted row equals the deterministic local replay —
    // GroupState carried correctly across real micro-batch boundaries
    val expect = (0L to maxId).groupBy(_ % users).flatMap { case (u, vs) =>
      val evs = vs.map { v =>
        EwmaEvent(u, v, new Timestamp(base + v * 1000L),
          if (v % 7 != 0) Some((v % 97).toDouble) else None)
      }
      EwmaState.foldBatch(u, None, evs)._1
    }.map(o => (o.user_id, o.event_id) -> (o.x, o.ewma)).toMap
    out.foreach { case (u, id, x, e) =>
      assert(expect((u, id)) == ((x, e)),
        s"user $u event $id: got ($x,$e) want ${expect((u, id))}")
    }
    // the null-metric sentinel path really ran
    assert(out.exists(_._3.isEmpty) && out.exists(_._4.isDefined))
  }
}
