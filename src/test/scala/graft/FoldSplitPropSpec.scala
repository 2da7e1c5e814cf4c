package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BalanceState, BalEvent, QuotaEvent, QuotaState}

/** The streaming==batch claims for the round-8 state operators rest on
  * one algebraic property: folding a user's series in ANY time-split
  * batching (each batch internally unsorted — the fold sorts) equals
  * the single-batch fold. The restart specs exercise one median split;
  * this property test exercises many random split points and random
  * within-batch shuffles, so the carry logic (day rollover, running
  * min/sum) can't quietly depend on the particular split the fixture
  * happens to produce. */
class FoldSplitPropSpec extends AnyFunSuite {

  private def ts(us: Long) = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  test("QuotaState: any time-split batching == one batch, many seeds") {
    val rnd = new scala.util.Random(99L)
    for (trial <- 1 to 50) {
      val n = 5 + rnd.nextInt(60)
      // events across ~4 days with duplicates-in-time possible
      val evs = (1 to n).map { i =>
        QuotaEvent(7L, i.toLong,
          ts(rnd.nextInt(4 * 86400) * 1000000L + rnd.nextInt(1000)))
      }
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val (oneShot, _) = QuotaState.foldBatch(7L, None, rnd.shuffle(evs))
      // split the TIME-SORTED feed at 0-3 random points, shuffle within
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(n + 1)).sorted.distinct
      val bounds = (0 +: cuts :+ n).distinct.sorted
      var st: Option[graft.streaming.QuotaCount] = None
      var out = Vector.empty[graft.streaming.QuotaAdmit]
      bounds.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) {
          val (hits, s2) =
            QuotaState.foldBatch(7L, st, rnd.shuffle(sorted.slice(a, b)))
          out ++= hits; st = Some(s2)
        }
      }
      assert(out == oneShot, s"trial $trial: split fold diverged")
    }
  }

  test("BalanceState: any time-split batching == one batch, many seeds") {
    val rnd = new scala.util.Random(123L)
    for (trial <- 1 to 50) {
      val n = 5 + rnd.nextInt(60)
      val evs = (1 to n).map { i =>
        BalEvent(9L, i.toLong,
          ts(rnd.nextInt(4 * 86400) * 1000000L),
          if (rnd.nextBoolean()) "click" else "purchase",
          Some(rnd.nextInt(500) / 100.0))
      }
      val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id))
      val (oneShot, endSt) = BalanceState.foldBatch(9L, None, rnd.shuffle(evs))
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(n + 1)).sorted.distinct
      val bounds = (0 +: cuts :+ n).distinct.sorted
      var st: Option[graft.streaming.BalMoments] = None
      var out = Vector.empty[graft.streaming.BalRow]
      bounds.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) {
          val (rows, s2) =
            BalanceState.foldBatch(9L, st, rnd.shuffle(sorted.slice(a, b)))
          out ++= rows; st = Some(s2)
        }
      }
      assert(out == oneShot, s"trial $trial: split fold diverged")
      assert(st.contains(endSt), s"trial $trial: end state diverged")
      // the identity itself: every balance is the clamped fold
      var bal = 0L
      sorted.zip(oneShot).foreach { case (e, r) =>
        val cents = math.floor(e.value.get * 100.0).toLong
        val x = if (e.event_type == "click") cents else -cents
        bal = math.max(0L, bal + x)
        assert(r.balance == bal,
          s"trial $trial: identity broke at event ${e.event_id}")
      }
    }
  }

  /** Micros-exact ordering key (matches the folds' own sort —
    * Timestamp.getTime truncates sub-ms and would mis-split). */
  private def usOf(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  /** Generic split-fold harness for the remaining state operators
    * (s19/s20/s21 — their restart specs exercise ONE median split;
    * this exercises many random splits + within-batch shuffles). */
  private def checkSplitFold[E, S, O](label: String, seed: Long,
      gen: (scala.util.Random, Int) => E,
      sortKey: E => (Long, Long),
      fold: (Option[S], Seq[E]) => (Seq[O], S)): Unit = {
    val rnd = new scala.util.Random(seed)
    for (trial <- 1 to 50) {
      val n = 5 + rnd.nextInt(60)
      val evs = (1 to n).map(i => gen(rnd, i))
      val sorted = evs.sortBy(sortKey)
      val (oneShot, endSt) = fold(None, rnd.shuffle(evs))
      val cuts = Seq.fill(rnd.nextInt(4))(rnd.nextInt(n + 1)).sorted.distinct
      val bounds = (0 +: cuts :+ n).distinct.sorted
      var st: Option[S] = None
      var out = Vector.empty[O]
      bounds.sliding(2).foreach { case Seq(a, b) =>
        if (b > a) {
          val (rows, s2) = fold(st, rnd.shuffle(sorted.slice(a, b)))
          out ++= rows; st = Some(s2)
        }
      }
      assert(out == oneShot, s"$label trial $trial: split fold diverged")
      assert(st.contains(endSt), s"$label trial $trial: end state diverged")
    }
  }

  test("FunnelState: any time-split batching == one batch, many seeds") {
    import graft.streaming.{FunnelEvent, FunnelState}
    checkSplitFold[FunnelEvent, graft.streaming.FunnelProgress,
        graft.streaming.Conversion]("funnel", 7L,
      (rnd, i) => FunnelEvent(3L,
        Seq("view", "click", "purchase", "other")(rnd.nextInt(4)),
        ts(rnd.nextInt(4 * 86400) * 1000000L + rnd.nextInt(1000)), i.toLong),
      e => (usOf(e.ts), e.event_id),
      (st, evs) => FunnelState.foldBatch(3L, st, evs))
  }

  test("Scd2State: any time-split batching == one batch, many seeds") {
    import graft.streaming.{Scd2Event, Scd2State}
    checkSplitFold[Scd2Event, graft.streaming.Scd2Open,
        graft.streaming.Scd2Closed]("scd2", 11L,
      (rnd, i) => Scd2Event(4L, i.toLong,
        ts(rnd.nextInt(4 * 86400) * 1000000L + rnd.nextInt(1000)),
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(900) / 10.0)),
      e => (usOf(e.ts), e.event_id),
      (st, evs) => {
        val (rows, s2) = Scd2State.foldBatch(4L, st, evs)
        (rows, s2.getOrElse(
          graft.streaming.Scd2Open(-1L, None, Long.MinValue)))
      })
  }

  test("EwmaState: any time-split batching == one batch, many seeds") {
    import graft.streaming.{EwmaEvent, EwmaState}
    checkSplitFold[EwmaEvent, graft.streaming.EwmaRing,
        graft.streaming.EwmaOut]("ewma", 17L,
      (rnd, i) => EwmaEvent(6L, i.toLong,
        ts(rnd.nextInt(4 * 86400) * 1000000L + rnd.nextInt(1000)),
        if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(400) / 10.0)),
      e => (usOf(e.ts), e.event_id),
      (st, evs) => EwmaState.foldBatch(6L, st, evs))
  }

  test("CoverageState: any time-split batching == one batch, many seeds") {
    import graft.streaming.{CovEvent, CoverageState}
    checkSplitFold[CovEvent, graft.streaming.CovState,
        graft.streaming.CovRow]("coverage", 23L,
      (rnd, i) => CovEvent(8L, i.toLong,
        // spread across ~6 interval-widths so runs both extend and close
        ts(rnd.nextInt(6 * 600) * 1000000L + rnd.nextInt(1000))),
      e => (usOf(e.ts), e.event_id),
      (st, evs) => CoverageState.foldBatch(8L, st, evs))
  }

  test("AnomState: any time-split batching == one batch, many seeds") {
    import graft.streaming.{AnomEvent, AnomState}
    checkSplitFold[AnomEvent, graft.streaming.AnomMoments,
        graft.streaming.AnomHit]("anom", 13L,
      (rnd, i) => AnomEvent(5L, i.toLong,
        ts(rnd.nextInt(4 * 86400) * 1000000L + rnd.nextInt(1000)),
        if (rnd.nextInt(7) == 0) None else Some(rnd.nextInt(300) / 100.0)),
      e => (usOf(e.ts), e.event_id),
      (st, evs) => AnomState.foldBatch(5L, st, evs))
  }
}
