package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class BalEvent(user_id: Long, event_id: Long, ts: Timestamp,
                    event_type: String, value: Option[Double])

/** Per-user fold state: the raw running sum and its running minimum —
  * the two quantities q112's window identity
  * b_t = S_t − min(0, min_{k≤t} S_k) needs, carried incrementally. */
case class BalMoments(s: Long, minS: Long)

case class BalRow(user_id: Long, event_id: Long, x: Long, s: Long,
                  balance: Long)

/** Streaming clamped running balance — q112's in-flight twin: the
  * credit/inventory process b_t = max(0, b_{t−1} + x_t) maintained as
  * events arrive. The batch form needs the two-window identity because
  * the clamp is non-associative; the STREAM needs no identity at all —
  * it simply carries (S, min S) and emits S − min(0, minS), which
  * equals the clamped fold by the same algebra. Emission is
  * PREFIX-DEPENDENT (each balance depends only on the user's earlier
  * events in (ts, event_id) order), so streamed == batch over a
  * time-ordered feed (the s19/s20/s21/s25 convention).
  *
  * Scale: state = two longs per active user with event-time-anchored
  * eviction; the batch/oracle form is q112's one user-partitioned
  * window pass.
  */
object BalanceState {

  /** Idle-state eviction horizon. */
  val HorizonDays = 365L

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def xOf(e: BalEvent): Long = {
    val cents = math.floor(e.value.getOrElse(0.0) * 100.0).toLong
    if (e.event_type == "click") cents else -cents
  }

  /** Fold a user's (sorted) events against prior (S, minS): per-event
    * balances, updated state. */
  def foldBatch(uid: Long, prior: Option[BalMoments],
                events: Seq[BalEvent]): (Seq[BalRow], BalMoments) = {
    val sorted = events.sortBy(e => (micros(e.ts), e.event_id))
    var st = prior.getOrElse(BalMoments(0L, 0L))
    var out = Vector.empty[BalRow]
    sorted.foreach { e =>
      val x = xOf(e)
      val s = st.s + x
      val m = math.min(st.minS, s)
      st = BalMoments(s, m)
      out :+= BalRow(uid, e.event_id, x, s, s - math.min(0L, m))
    }
    (out, st)
  }

  /** Batch form: the full series folded per user — equals q112's
    * two-window build (and the DuckDB oracle). */
  def balancesBatch(events: Dataset[BalEvent]): Dataset[BalRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups((uid: Long, it: Iterator[BalEvent]) =>
        foldBatch(uid, None, it.toSeq)._1.iterator)
  }

  /** Streaming form: balances emit as events arrive; state is (S,
    * min S) per user. */
  def balancesStreaming(events: Dataset[BalEvent]): Dataset[BalRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BalMoments, BalRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[BalEvent], state: GroupState[BalMoments]) =>
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
                 df: org.apache.spark.sql.DataFrame): Dataset[BalEvent] = {
    import spark.implicits._
    df.filter("user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL" +
        " AND event_type IN ('click', 'purchase')")
      .selectExpr("user_id", "event_id", "ts", "event_type", "value")
      .as[BalEvent]
  }
}
