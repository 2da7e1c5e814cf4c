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

  test("foldBatch: a late event older than the stored end never regresses it") {
    import graft.streaming.{SessionEvent, SessionState}
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // prior session ends at t=1200; a late event at t=600 arrives next batch
    val prior = SessionState(ts(0), ts(1200), 3L)
    val (closed, st) = StatefulSessions.foldBatch(7L, Some(prior),
      Seq(SessionEvent(7L, ts(600), 99L)))
    assert(closed.isEmpty)
    assert(st.end === ts(1200), "late event regressed session end")
    assert(st.n === 4L)
    // and an in-order event still extends it
    val (_, st2) = StatefulSessions.foldBatch(7L, Some(st),
      Seq(SessionEvent(7L, ts(1500), 100L)))
    assert(st2.end === ts(1500) && st2.n === 5L)
    // a gap beyond 1800s closes the session with the non-regressed end
    val (closed3, st3) = StatefulSessions.foldBatch(7L, Some(st2),
      Seq(SessionEvent(7L, ts(4000), 101L)))
    assert(closed3 === Seq(graft.streaming.UserSession(7L, ts(0), ts(1500), 5L)))
    assert(st3.start === ts(4000) && st3.n === 1L)
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
