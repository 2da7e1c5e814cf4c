package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class Scd2Event(user_id: Long, event_id: Long, ts: Timestamp,
                     value: Option[Double])
case class Scd2Open(version: Long, attr: Option[Long], valid_from: Long)
case class Scd2Closed(user_id: Long, version: Long, attr: Option[Long],
                      valid_from: Long, valid_to: Long)

/** Streaming SCD2 apply (q82/q84's dimension maintained INCREMENTALLY):
  * each arriving change CLOSES the user's open version row — emitting
  * [valid_from, valid_to) with its version number the moment the
  * superseding change arrives — and opens the next version in state.
  * Open rows live only in state (they would otherwise retract when
  * closed); the batch/snapshot path publishes them, the stream
  * publishes exactly the CLOSED rows. Validity bounds are epoch
  * MICROSECONDS (`unix_micros`), so the fold's event-time order and
  * the batch window's (valid_from, event_id) order are the same total
  * order — no same-second tie can diverge between the incremental and
  * declarative forms.
  *
  * Scale: state per user is one (version, attr, valid_from) triple —
  * O(active users), not O(events); event-time timeout evicts users
  * idle past the horizon (their open row simply never closes — the
  * same bounded-state trade s19 documents). The streaming contract
  * requires a time-ordered feed ACROSS micro-batches (batches sort
  * internally; Scd2StreamSpec feeds time-split files), matching s19's
  * convention.
  */
object Scd2State {

  /** Idle-state eviction horizon. */
  val HorizonDays = 365L

  private def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def attrOf(v: Option[Double]): Option[Long] =
    v.map(x => math.floor(x).toLong)

  /** One fold over (sorted) changes against the optional open row:
    * (closed rows emitted, next open row). */
  def foldBatch(uid: Long, prior: Option[Scd2Open],
                events: Seq[Scd2Event]): (Seq[Scd2Closed], Option[Scd2Open]) = {
    val sorted = events.sortBy(e => (micros(e.ts), e.event_id))
    var st = prior
    var out = Vector.empty[Scd2Closed]
    sorted.foreach { e =>
      val from = micros(e.ts)
      st match {
        case Some(o) =>
          out :+= Scd2Closed(uid, o.version, o.attr, o.valid_from, from)
          st = Some(Scd2Open(o.version + 1, attrOf(e.value), from))
        case None =>
          st = Some(Scd2Open(1L, attrOf(e.value), from))
      }
    }
    (out, st)
  }

  /** Batch form: the full log folded per user — equals the window
    * build restricted to closed rows. */
  def closedRowsBatch(events: Dataset[Scd2Event]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups((uid: Long, it: Iterator[Scd2Event]) =>
        foldBatch(uid, None, it.toSeq)._1.iterator)
  }

  /** Streaming form: closed rows emit as their superseding change
    * arrives; timed-out users evict silently (their open row is the
    * batch path's to publish). */
  def closedRowsStreaming(events: Dataset[Scd2Event]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2Open, Scd2Closed](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Scd2Event], state: GroupState[Scd2Open]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val events = it.toSeq
            val (out, st) = foldBatch(uid, state.getOption, events)
            // st is always Some after a non-empty batch; anchor the
            // timeout on EVENT time (s19's lesson: the watermark is 0
            // during the first batch)
            st.foreach(state.update)
            state.setTimeoutTimestamp(
              events.map(_.ts.getTime).max + HorizonDays * 24 * 3600 * 1000L)
            out.iterator
          }
      }
  }

  /** Adapter from the events table shape. */
  def fromEvents(spark: SparkSession,
                 df: org.apache.spark.sql.DataFrame): Dataset[Scd2Event] = {
    import spark.implicits._
    df.filter("user_id IS NOT NULL AND ts IS NOT NULL")
      .selectExpr("user_id", "event_id", "ts", "value")
      .as[Scd2Event]
  }
}
