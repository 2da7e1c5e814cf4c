package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class QuotaEvent(user_id: Long, event_id: Long, ts: Timestamp)

/** Per-user admission state: the UTC day currently being counted and
  * how many events were admitted on it — two longs per user, the
  * smallest state a daily quota can carry. */
case class QuotaCount(day: Long, n: Long)

case class QuotaAdmit(user_id: Long, event_id: Long, day: Long, rk: Long)

/** Streaming per-user daily quota gate — the rate-limit verb an ingest
  * pipeline runs in front of expensive downstream work: admit at most
  * [[Cap]] events per user per UTC day, in event-time order; the rest
  * are dropped at the gate.
  *
  * Admission is PREFIX-DEPENDENT (an event's verdict depends only on
  * how many same-user-same-day events precede it in the total
  * (ts, event_id) order), so the incremental fold equals the batch
  * window form over a time-ordered feed — the s19/s20/s21 convention:
  * batches sort internally, the feed is time-split across
  * micro-batches, so a user's day index is monotone across batches and
  * the (day, n) pair never needs history beyond the current day.
  *
  * Scale: state = two longs per ACTIVE user (event-time timeout evicts
  * idle users past the horizon); the batch/oracle form is one
  * (user, day)-partitioned row_number window — partitions bounded by a
  * user's daily event count, fully parallel at any corpus size.
  */
object QuotaState {

  /** Admissions allowed per user per UTC day. */
  val Cap = 3L
  /** Idle-state eviction horizon. */
  val HorizonDays = 365L

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def dayOf(t: Timestamp): Long =
    Math.floorDiv(micros(t), 86400000000L)

  /** Fold a user's (sorted) events against the prior (day, count):
    * admitted events with their rank, updated state. */
  def foldBatch(uid: Long, prior: Option[QuotaCount],
                events: Seq[QuotaEvent]): (Seq[QuotaAdmit], QuotaCount) = {
    val sorted = events.sortBy(e => (micros(e.ts), e.event_id))
    var st = prior.getOrElse(QuotaCount(Long.MinValue, 0L))
    var out = Vector.empty[QuotaAdmit]
    sorted.foreach { e =>
      val d = dayOf(e.ts)
      // the time-ordered feed contract makes d monotone per user; on a
      // new day the counter resets. A REGRESSION (event from an earlier
      // day than the stored state) means the feed violated the contract
      // — resetting would silently reopen the user's quota and lose the
      // current day's count, so fail loudly instead (QuotaStreamSpec
      // pins this guard).
      if (st.day != Long.MinValue && d < st.day)
        throw new IllegalStateException(
          s"QuotaState: out-of-order feed — user $uid event ${e.event_id} " +
            s"is on day $d but state already advanced to day ${st.day}; " +
            "the quota gate requires a time-ordered feed")
      if (d != st.day) st = QuotaCount(d, 0L)
      if (st.n < Cap) {
        out :+= QuotaAdmit(uid, e.event_id, d, st.n + 1)
        st = QuotaCount(d, st.n + 1)
      }
    }
    (out, st)
  }

  /** Batch form: the full series folded per user — equals the window
    * build (and the DuckDB oracle). */
  def admittedBatch(events: Dataset[QuotaEvent]): Dataset[QuotaAdmit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups((uid: Long, it: Iterator[QuotaEvent]) =>
        foldBatch(uid, None, it.toSeq)._1.iterator)
  }

  /** Streaming form: admissions emit as events arrive; state is the
    * (day, count) pair per user. */
  def admittedStreaming(events: Dataset[QuotaEvent]): Dataset[QuotaAdmit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[QuotaCount, QuotaAdmit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[QuotaEvent], state: GroupState[QuotaCount]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val events = it.toSeq
            val (out, st) = foldBatch(uid, state.getOption, events)
            state.update(st)
            // EVENT-time-anchored timeout (s19's lesson: the watermark
            // is 0 during the first batch)
            state.setTimeoutTimestamp(
              events.map(_.ts.getTime).max + HorizonDays * 24 * 3600 * 1000L)
            out.iterator
          }
      }
  }

  def fromEvents(spark: org.apache.spark.sql.SparkSession,
                 df: org.apache.spark.sql.DataFrame): Dataset[QuotaEvent] = {
    import spark.implicits._
    df.filter("user_id IS NOT NULL AND ts IS NOT NULL")
      .selectExpr("user_id", "event_id", "ts")
      .as[QuotaEvent]
  }
}
