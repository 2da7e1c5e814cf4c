package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class CovEvent(user_id: Long, event_id: Long, ts: Timestamp)

/** Per-user sweep state: closed-run totals plus the OPEN run's bounds —
  * everything q113's sweep-line union needs, carried incrementally.
  * rs = Long.MinValue marks "no run open yet" (before the first event). */
case class CovState(runs: Long, covered: Long, events: Long,
                    rs: Long, re: Long)

case class CovRow(user_id: Long, event_id: Long, st: Long, run: Long,
                  covered_live: Long)

/** Streaming interval-union coverage — q113's in-flight twin: every
  * event opens a 10-minute activity interval, overlaps count once, and
  * the per-user "active time so far" is served LIVE. The batch form
  * needs two windows + a run aggregate because the union is a sweep;
  * the stream needs only the sweep state itself — closed-run totals
  * plus the open run's (start, max end) — because events arrive in
  * (ts, event_id) order (the s19/s20/s21/s25/s26 time-ordered-feed
  * convention), so an arriving interval either extends the open run or
  * closes it and opens the next. Emission is PREFIX-DEPENDENT (each
  * covered_live depends only on the user's earlier events), so
  * streamed == batch over a time-ordered feed.
  *
  * Scale: state = five longs per active user with event-time-anchored
  * eviction; the batch/oracle form is q113's two user-partitioned
  * windows + one (user, run) partial aggregate.
  */
object CoverageState {

  /** Interval width: 10 minutes in micros (q113's W). */
  val W = 600000000L

  /** Idle-state eviction horizon. */
  val HorizonDays = 365L

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Fold a user's (sorted) events against the prior sweep state:
    * per-event live coverage rows, updated state. */
  def foldBatch(uid: Long, prior: Option[CovState],
                events: Seq[CovEvent]): (Seq[CovRow], CovState) = {
    val sorted = events.sortBy(e => (micros(e.ts), e.event_id))
    var st = prior.getOrElse(CovState(0L, 0L, 0L, Long.MinValue, Long.MinValue))
    var out = Vector.empty[CovRow]
    sorted.foreach { e =>
      val s = micros(e.ts)
      val en = s + W
      if (st.rs == Long.MinValue)
        st = st.copy(rs = s, re = en)
      else if (s > st.re)
        st = CovState(st.runs + 1, st.covered + (st.re - st.rs),
          st.events, s, en)
      else if (en > st.re)
        st = st.copy(re = en)
      st = st.copy(events = st.events + 1)
      out :+= CovRow(uid, e.event_id, s, st.runs + 1,
        st.covered + (st.re - st.rs))
    }
    (out, st)
  }

  /** Batch form: the full series folded per user — equals the q113
    * window build (and the DuckDB oracle). */
  def coverageBatch(events: Dataset[CovEvent]): Dataset[CovRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups((uid: Long, it: Iterator[CovEvent]) =>
        foldBatch(uid, None, it.toSeq)._1.iterator)
  }

  /** Streaming form: live coverage emits as events arrive; state is
    * the five-long sweep state per user. */
  def coverageStreaming(events: Dataset[CovEvent]): Dataset[CovRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[CovState, CovRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[CovEvent], state: GroupState[CovState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val events = it.toSeq
            val (out, st) = foldBatch(uid, state.getOption, events)
            state.update(st)
            state.setTimeoutTimestamp(
              events.map(_.ts.getTime).max + HorizonDays * 24 * 3600 * 1000L)
            out.iterator
          }
      }
  }

  def fromEvents(spark: org.apache.spark.sql.SparkSession,
                 df: org.apache.spark.sql.DataFrame): Dataset[CovEvent] = {
    import spark.implicits._
    df.filter("user_id IS NOT NULL AND ts IS NOT NULL")
      .selectExpr("user_id", "event_id", "ts")
      .as[CovEvent]
  }
}
