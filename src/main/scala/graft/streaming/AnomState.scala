package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class AnomEvent(user_id: Long, event_id: Long, ts: Timestamp,
                     value: Option[Double])

/** Exact per-user moment sums over everything seen so far: count, Σx,
  * Σx² of the integerized metric (x = floor(value·100) — cents). All
  * int64: at the declared data scale every quantity is far under 2⁶³,
  * so the anomaly decision is pure integer arithmetic — no float
  * variance, no cross-engine epsilon. */
case class AnomMoments(n: Long, s: Long, q: Long)

case class AnomHit(user_id: Long, event_id: Long, x: Long, n_prior: Long)

/** Streaming z-score anomaly detection — the monitoring verb over the
  * event stream: flag an observation whose squared deviation from the
  * user's PRIOR running mean exceeds 9× the prior running (population)
  * variance, i.e. |z| > 3, with ≥ 8 observations of history.
  *
  * Scoring against the PRIOR state (the prefix, not the full series) is
  * what makes the incremental fold equal the batch window form: each
  * row's verdict depends only on rows before it in the total
  * (ts, event_id) order, so streamed == batch over a time-ordered feed
  * (s19/s20's convention — batches sort internally, the feed is
  * time-split across micro-batches).
  *
  * The z test is exact integer algebra: with prior sums (n, S, Q),
  * mean = S/n and n²·var = n·Q − S², so
  *   (x − mean)² > 9·var  ⟺  (n·x − S)² > 9·(n·Q − S²)
  * — both sides int64, no division, no sqrt.
  *
  * Scale: state per user is three longs — O(active users); event-time
  * timeout evicts users idle past the horizon. The batch/oracle form is
  * one user-partitioned window pass (cumulative count/sum over the
  * UNBOUNDED-PRECEDING-to-1-PRECEDING frame), full parallelism.
  */
object AnomState {

  /** Minimum history before scoring. */
  val MinHistory = 8L
  /** Idle-state eviction horizon. */
  val HorizonDays = 365L

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def xOf(v: Option[Double]): Long =
    math.floor(v.getOrElse(0.0) * 100.0).toLong

  /** Fold a user's (sorted) events against prior moments: anomalies
    * emitted, updated moments. */
  def foldBatch(uid: Long, prior: Option[AnomMoments],
                events: Seq[AnomEvent]): (Seq[AnomHit], AnomMoments) = {
    val sorted = events.sortBy(e => (micros(e.ts), e.event_id))
    var st = prior.getOrElse(AnomMoments(0L, 0L, 0L))
    var out = Vector.empty[AnomHit]
    sorted.foreach { e =>
      val x = xOf(e.value)
      if (st.n >= MinHistory) {
        val dev = st.n * x - st.s
        if (dev * dev > 9L * (st.n * st.q - st.s * st.s))
          out :+= AnomHit(uid, e.event_id, x, st.n)
      }
      st = AnomMoments(st.n + 1, st.s + x, st.q + x * x)
    }
    (out, st)
  }

  /** Batch form: the full series folded per user — equals the window
    * build (and the DuckDB oracle). */
  def anomaliesBatch(events: Dataset[AnomEvent]): Dataset[AnomHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups((uid: Long, it: Iterator[AnomEvent]) =>
        foldBatch(uid, None, it.toSeq)._1.iterator)
  }

  /** Streaming form: anomalies emit as events arrive; state is the
    * three moment sums per user. */
  def anomaliesStreaming(events: Dataset[AnomEvent]): Dataset[AnomHit] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AnomMoments, AnomHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[AnomEvent], state: GroupState[AnomMoments]) =>
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
                 df: org.apache.spark.sql.DataFrame): Dataset[AnomEvent] = {
    import spark.implicits._
    df.filter("user_id IS NOT NULL AND ts IS NOT NULL")
      .selectExpr("user_id", "event_id", "ts", "value")
      .as[AnomEvent]
  }
}
