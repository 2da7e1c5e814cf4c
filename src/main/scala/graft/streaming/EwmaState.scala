package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class EwmaEvent(user_id: Long, event_id: Long, ts: Timestamp,
                     value: Option[Double])

/** Per-user ring of the LAST [[EwmaState.Lags]] metric values, most
  * recent first — a NULL metric is stored as [[EwmaState.NullX]]
  * (q79's window consumes a null lag as 0 via COALESCE, but the null
  * event's OWN ewma stays NULL; the sentinel keeps both behaviors). */
case class EwmaRing(h: Seq[Long])

case class EwmaOut(user_id: Long, event_id: Long, x: Option[Long],
                   ewma: Option[Double])

/** Streaming EWMA — q79's truncated exponentially-weighted average
  * (weights 2⁷..2⁰ over the current + 7 prior values, denominator 256)
  * maintained as events arrive. Unlike the scalar-sum states
  * (Quota/Balance/Anom), the carried state is a BOUNDED RING: the last
  * 7 values per user — the third state shape the s-family exercises,
  * and exactly what any finite-window streaming feature (rolling mean,
  * bounded lag features for online models) carries.
  *
  * The emission is prefix-dependent on ONLY the ring, so the
  * incremental fold over a time-ordered feed equals q79's batch window
  * build row-for-row (the s19/s20/s21 convention; EwmaStreamSpec pins
  * it across a checkpointed restart, FoldSplitPropSpec pins any-split
  * equality). The numerator is exact int64 (values floor to integers,
  * weights are powers of two); the one IEEE op is the final /256.
  *
  * Scale: state = ≤ 7 longs per active user with event-time eviction;
  * the batch form is one user-partitioned window pass.
  */
object EwmaState {

  val Lags = 7
  /** Sentinel for a stored NULL metric (no real x collides: q79's x
    * values are floor(value) of bounded fixture metrics). */
  val NullX: Long = Long.MinValue
  /** Idle-state eviction horizon. */
  val HorizonDays = 365L

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def xOf(v: Option[Double]): Option[Long] =
    v.map(d => math.floor(d).toLong)

  /** Fold a user's (sorted) events against the prior ring. */
  def foldBatch(uid: Long, prior: Option[EwmaRing],
                events: Seq[EwmaEvent]): (Seq[EwmaOut], EwmaRing) = {
    val sorted = events.sortBy(e => (micros(e.ts), e.event_id))
    var ring = prior.map(_.h.toVector).getOrElse(Vector.empty[Long])
    var out = Vector.empty[EwmaOut]
    sorted.foreach { e =>
      val x = xOf(e.value)
      val ewma = x.map { xv =>
        var num = xv * 128L
        var k = 0
        while (k < Lags) {
          val lag =
            if (k < ring.size && ring(k) != NullX) ring(k) else 0L
          num += lag * (1L << (Lags - 1 - k))
          k += 1
        }
        num.toDouble / 256.0
      }
      out :+= EwmaOut(uid, e.event_id, x, ewma)
      ring = (x.getOrElse(NullX) +: ring).take(Lags)
    }
    (out, EwmaRing(ring))
  }

  /** Streaming form: emissions as events arrive; state = the ring. */
  def streamed(events: Dataset[EwmaEvent]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaRing, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[EwmaEvent], state: GroupState[EwmaRing]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val evs = it.toSeq
            val (out, st) = foldBatch(uid, state.getOption, evs)
            state.update(st)
            state.setTimeoutTimestamp(
              evs.map(_.ts.getTime).max + HorizonDays * 24 * 3600 * 1000L)
            out.iterator
          }
      }
  }
}
