package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)
case class SessionState(start: Timestamp, end: Timestamp, n: Long)
case class UserSession(user_id: Long, session_start: Timestamp,
                       session_end: Timestamp, n_events: Long)

/** Custom-state sessionization via `flatMapGroupsWithState` (SURVEY §1.3
  * "Highland stream (unbounded analog)"; the KeyValueGroupedDataset custom
  * state surface). Gap rule identical to S03: a gap strictly greater than
  * `gapSeconds` closes the session — so the batch form here is
  * row-for-row equal to the S03 LAG/cumulative-sum oracle query.
  *
  * Scale: state per key is three longs; in streaming mode the state store
  * holds one `SessionState` per live user and event-time timeout evicts
  * idle users, so memory is O(active users), not O(events).
  */
object StatefulSessions {
  val GapSeconds = 1800L

  /** Full-precision epoch micros — Timestamp.getTime alone would truncate
    * the microseconds the events table carries, shifting gap boundaries. */
  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  private def gapExceeded(prevEnd: Timestamp, t: Timestamp): Boolean =
    micros(t) - micros(prevEnd) > GapSeconds * 1000000L

  /** Shared per-user sessionizer: events (sorted by ts,event_id) → closed
    * sessions, last session flushed at end-of-group. */
  private def sessionize(events: Iterator[SessionEvent]): Iterator[UserSession] = {
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    if (sorted.isEmpty) return Iterator.empty
    val out = Seq.newBuilder[UserSession]
    var st = SessionState(sorted.head.ts, sorted.head.ts, 0L)
    val uid = sorted.head.user_id
    sorted.foreach { e =>
      if (gapExceeded(st.end, e.ts)) {
        out += UserSession(uid, st.start, st.end, st.n)
        st = SessionState(e.ts, e.ts, 1L)
      } else {
        st = SessionState(st.start, e.ts, st.n + 1)
      }
    }
    out += UserSession(uid, st.start, st.end, st.n)
    out.result().iterator
  }

  /** One micro-batch fold: events (any order) into optional prior state →
    * (closed sessions, new open state). Exposed for unit-testing the
    * late-event semantics the streaming closure relies on.
    *
    * Requires at least one event when no prior state exists — the
    * streaming runtime never invokes the fold on an empty, stateless
    * group, but as a public API the precondition is checked explicitly
    * rather than failing with an opaque NoSuchElementException. */
  def foldBatch(uid: Long, prior: Option[SessionState],
                events: Seq[SessionEvent]): (Seq[UserSession], SessionState) = {
    require(prior.nonEmpty || events.nonEmpty,
      s"foldBatch(uid=$uid): no prior state and no events")
    val sorted = events.sortBy(e => (micros(e.ts), e.event_id))
    var closed = Vector.empty[UserSession]
    var st = prior.getOrElse {
      val h = sorted.head
      SessionState(h.ts, h.ts, 0L)
    }
    sorted.foreach { e =>
      if (gapExceeded(st.end, e.ts)) {
        closed :+= UserSession(uid, st.start, st.end, st.n)
        st = SessionState(e.ts, e.ts, 1L)
      } else {
        // a late watermark-admitted event may be OLDER than the stored
        // end (events are only per-batch sorted) — the session end must
        // never regress
        val end = if (micros(e.ts) > micros(st.end)) e.ts else st.end
        st = SessionState(st.start, end, st.n + 1)
      }
    }
    (closed, st)
  }

  /** Batch form: groupByKey + flatMapGroups. Equals the S03 oracle. */
  def sessionsBatch(events: Dataset[SessionEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups((_: Long, it: Iterator[SessionEvent]) => sessionize(it))
  }

  /** Streaming form: flatMapGroupsWithState with event-time timeout. Each
    * micro-batch folds its events into per-user state; a session is
    * emitted when the watermark passes its gap (timeout) — the state store
    * never holds more than one open session per user. */
  def sessionsStreaming(events: Dataset[SessionEvent]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(UserSession(uid, st.start, st.end, st.n))
          } else {
            val (closed, st) = foldBatch(uid, state.getOption, it.toSeq)
            state.update(st)
            state.setTimeoutTimestamp(st.end.getTime + GapSeconds * 1000)
            closed.iterator
          }
      }
  }

  /** Adapter from the events table shape. */
  def fromEvents(spark: SparkSession, df: org.apache.spark.sql.DataFrame): Dataset[SessionEvent] = {
    import spark.implicits._
    df.selectExpr("user_id", "ts", "event_id").as[SessionEvent]
  }
}
