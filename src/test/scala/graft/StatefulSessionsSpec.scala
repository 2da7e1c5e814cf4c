package graft

import graft.queries.{StreamingQueries, Streams}
import graft.streaming.StatefulSessions
import org.scalatest.funsuite.AnyFunSuite

class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flatMapGroups batch sessionization == S03 LAG/cumsum oracle form") {
    val batch = StreamingQueries.queries("s03_sessions")(spark, TestSpark.Sf)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val fm = StatefulSessions.sessionsBatch(
      StatefulSessions.fromEvents(spark, Tables(spark, TestSpark.Sf, "events")))
      .selectExpr("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(fm === batch)
  }

  test("flatMapGroupsWithState streaming emits a consistent subset") {
    // with a bounded source the last open session per user stays in state
    // (no post-end watermark advance), so streaming output must be a
    // subset of the batch sessions and identical where emitted
    val batch = StatefulSessions.sessionsBatch(
      StatefulSessions.fromEvents(spark, Tables(spark, TestSpark.Sf, "events")))
      .collect().map(s => (s.user_id, s.session_start.getTime) ->
        (s.session_end.getTime, s.n_events)).toMap
    val stream = Streams.runToTable(spark,
      StatefulSessions.sessionsStreaming(
        StatefulSessions.fromEvents(spark,
          Streams.readEvents(spark, TestSpark.Sf))).toDF(),
      "stateful_sessions", "append")
    val rows = stream.collect()
    assert(rows.nonEmpty, "streaming emitted nothing")
    rows.foreach { r =>
      val key = (r.getLong(0), r.getTimestamp(1).getTime)
      assert(batch.contains(key), s"spurious session $key")
      assert(batch(key) === ((r.getTimestamp(2).getTime, r.getLong(3))),
        s"session mismatch for $key")
    }
  }
}
