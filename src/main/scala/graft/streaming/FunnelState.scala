package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp,
                       event_id: Long)
case class FunnelProgress(t1: Option[Timestamp], t2: Option[Timestamp],
                          done: Boolean)
case class Conversion(user_id: Long, t1: Timestamp, t2: Timestamp,
                      t3: Timestamp)

/** Streaming funnel detection (q66's view → click → purchase contract)
  * as a `flatMapGroupsWithState` state machine — the conversion fires
  * the moment the completing purchase arrives, instead of waiting for
  * a batch job over the full log.
  *
  * Semantics are EXACTLY q66's: t1 = min view ts, t2 = min click with
  * ts strictly after t1, t3 = min purchase strictly after t2.
  * Processing each group's events in (event-time, event_id) order
  * makes the incremental fold equal to the global-minimum form:
  * a later event can never lower an established stage timestamp
  * (event-time order ⇒ monotone), so first-qualifying == minimum.
  * The streaming contract therefore requires a time-ordered feed
  * ACROSS micro-batches (batches are sorted internally; a stage event
  * arriving in an earlier-time batch than a prior batch's events
  * would need retraction semantics, declared out of scope — the spec
  * feeds time-split files).
  *
  * Scale: state per user is two optional timestamps + a flag;
  * event-time timeout evicts users idle past `horizonDays`, so the
  * store is O(users active inside the horizon), not O(events). The
  * horizon is also the at-most-once guarantee's reach: a converted
  * user's tombstone evicts with the timeout, so a SECOND funnel
  * completed entirely beyond the horizon would re-emit — the same
  * bounded-state trade `dropDuplicatesWithinWatermark` makes
  * (FunnelStreamSpec pins the inside-horizon exactly-once).
  */
object FunnelState {

  /** Tombstone/idle-state eviction horizon. */
  val HorizonDays = 365L

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** One fold over (sorted) events against optional prior progress:
    * (emitted conversions, next state). */
  def foldBatch(uid: Long, prior: Option[FunnelProgress],
                events: Seq[FunnelEvent]): (Seq[Conversion], FunnelProgress) = {
    val sorted = events.sortBy(e => (micros(e.ts), e.event_id))
    var st = prior.getOrElse(FunnelProgress(None, None, done = false))
    var out = Vector.empty[Conversion]
    sorted.foreach { e =>
      e.event_type match {
        case "view" if st.t1.isEmpty =>
          st = st.copy(t1 = Some(e.ts))
        case "click" if st.t2.isEmpty &&
            st.t1.exists(t1 => micros(e.ts) > micros(t1)) =>
          st = st.copy(t2 = Some(e.ts))
        case "purchase" if !st.done &&
            st.t2.exists(t2 => micros(e.ts) > micros(t2)) =>
          out :+= Conversion(uid, st.t1.get, st.t2.get, e.ts)
          st = st.copy(done = true)
        case _ => ()
      }
    }
    (out, st)
  }

  /** Batch form: groupByKey + flatMapGroups over the full log. Equals
    * the q66 CTE chain restricted to completed funnels. */
  def conversionsBatch(events: Dataset[FunnelEvent]): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups((uid: Long, it: Iterator[FunnelEvent]) =>
        foldBatch(uid, None, it.toSeq)._1.iterator)
  }

  /** Streaming form: per micro-batch fold into per-user progress;
    * conversions emit as they complete; timed-out users evict with no
    * emission. */
  def conversionsStreaming(events: Dataset[FunnelEvent]): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProgress, Conversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val events = it.toSeq
            val (out, st) = foldBatch(uid, state.getOption, events)
            // the done flag MUST persist: dropping it would let a later
            // batch detect a second "first" conversion for the user —
            // the q66 contract emits at most one per user. Timeout
            // evicts the tombstone once the horizon passes. Anchor the
            // timeout on EVENT time: getCurrentWatermarkMs() is 0
            // during the first batch (the watermark is computed from
            // the previous batch), which would park every timeout in
            // 1970 and evict all state at the next batch.
            state.update(st)
            state.setTimeoutTimestamp(
              events.map(_.ts.getTime).max + HorizonDays * 24 * 3600 * 1000L)
            out.iterator
          }
      }
  }

  /** Adapter from the events table shape. */
  def fromEvents(spark: SparkSession,
                 df: org.apache.spark.sql.DataFrame): Dataset[FunnelEvent] = {
    import spark.implicits._
    df.filter("user_id IS NOT NULL AND ts IS NOT NULL AND " +
        "event_type IN ('view','click','purchase')")
      .selectExpr("user_id", "event_type", "ts", "event_id")
      .as[FunnelEvent]
  }
}
