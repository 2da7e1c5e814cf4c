package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (latest right-side event at or before each left timestamp)
  * as a single window pass over a tagged union (SURVEY §2B "as-of" row).
  *
  * Why not the correlated-scalar-subquery form (Q10)? Catalyst
  * decorrelates it into an aggregate-then-join per distinct predicate —
  * correct, but it re-aggregates the whole right side. The union form
  * shuffles each row exactly once on the key and resolves every probe
  * with one running `last(ignoreNulls)` — the classic time-series shape
  * that survives a 100× scale-up (one shuffle, no re-aggregation, and
  * per-key skew is bounded by the window sort).
  *
  * Tie rule: a right row at exactly the probe timestamp matches
  * (`<=` semantics) — right rows sort before left rows at equal ts.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `rightTs` is also the payload)
    * @param key       equi-join key column name (same name both sides)
    * @param leftTs    probe timestamp column in `left`
    * @param rightTs   reference timestamp column in `right`
    * @param out       output column name for the matched right timestamp
    */
  def latestAtOrBefore(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       out: String): DataFrame = {
    val probeExtra = left.columns.filterNot(c => c == key || c == leftTs).toSeq
    // the left payload passes through untouched, so the internal marker
    // columns must not collide with ANY caller column (or the output
    // name): pick the first suffix depth no existing column uses
    // no escape for out == leftTs either: that would emit TWO columns
    // named leftTs (the passed-through probe ts plus the as-of value),
    // ambiguous for any by-name downstream access
    require(!left.columns.contains(out),
      s"as-of output column '$out' collides with a left column")
    val taken = (left.columns ++ right.columns ++ Seq(out)).toSet
    val intern = Iterator.iterate("_")(_ + "_")
      .find(p => !taken.exists(_.startsWith(p + "ts"))
        && !taken.exists(_.startsWith(p + "isRight"))
        && !taken.exists(_.startsWith(p + "val"))).get
    val (tsC, flagC, valC) = (intern + "ts", intern + "isRight", intern + "val")
    val valT = right.schema(rightTs).dataType
    val rightSide = right.select(
      (Seq(col(key), col(rightTs).as(tsC), lit(1).as(flagC),
        col(rightTs).as(valC)) ++
        probeExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val leftSide = left.select(
      (Seq(col(key), col(leftTs).as(tsC), lit(0).as(flagC),
        lit(null).cast(valT).as(valC)) ++
        probeExtra.map(col)): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(tsC), col(flagC).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightSide.unionByName(leftSide)
      .withColumn(out, last(col(valC), ignoreNulls = true).over(w))
      .where(col(flagC) === 0)
      .select((Seq(col(key), col(tsC).as(leftTs)) ++ probeExtra.map(col)
        :+ col(out)): _*)
  }

  /** BOTH as-of picks in one pass — the building block of the NEAREST
    * direction (`merge_asof(direction='nearest')`): per probe, the
    * latest reference at or before (`outB`, `<=` semantics — ties
    * belong to the backward arm) AND the earliest reference strictly
    * after (`outF`). Same tagged union, same partitioning, same sort
    * as latestAtOrBefore; the forward pick is a `first(ignoreNulls)`
    * over the MIRRORED frame (current row → unbounded following) of
    * the identical window sort, so both directions cost ONE shuffle
    * and ONE sort total — nearest is as cheap as backward. (With
    * right rows sorting before left at equal ts, the forward frame
    * excludes equal-ts references by construction — exactly the
    * strict `>` the backward arm's `<=` complements.) */
  def bothSides(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String,
                outB: String, outF: String): DataFrame = {
    val probeExtra = left.columns.filterNot(c => c == key || c == leftTs).toSeq
    require(!left.columns.contains(outB) && !left.columns.contains(outF)
      && outB != outF, s"as-of output columns '$outB'/'$outF' collide")
    val taken = (left.columns ++ right.columns ++ Seq(outB, outF)).toSet
    val intern = Iterator.iterate("_")(_ + "_")
      .find(p => !taken.exists(_.startsWith(p + "ts"))
        && !taken.exists(_.startsWith(p + "isRight"))
        && !taken.exists(_.startsWith(p + "val"))).get
    val (tsC, flagC, valC) = (intern + "ts", intern + "isRight", intern + "val")
    val valT = right.schema(rightTs).dataType
    val rightSide = right.select(
      (Seq(col(key), col(rightTs).as(tsC), lit(1).as(flagC),
        col(rightTs).as(valC)) ++
        probeExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val leftSide = left.select(
      (Seq(col(key), col(leftTs).as(tsC), lit(0).as(flagC),
        lit(null).cast(valT).as(valC)) ++
        probeExtra.map(col)): _*)
    val ord = Window.partitionBy(key).orderBy(col(tsC), col(flagC).desc)
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    rightSide.unionByName(leftSide)
      .withColumn(outB, last(col(valC), ignoreNulls = true).over(wB))
      .withColumn(outF, first(col(valC), ignoreNulls = true).over(wF))
      .where(col(flagC) === 0)
      .select((Seq(col(key), col(tsC).as(leftTs)) ++ probeExtra.map(col)
        ++ Seq(col(outB), col(outF))): _*)
  }

  /** As-of join with a STALENESS TOLERANCE (the `merge_asof(...,
    * tolerance=...)` member of the family): the latest right row at or
    * before the probe that is also no older than `toleranceUs`
    * microseconds; older-only matches surface as NULL, exactly like
    * no-match. Implementation is the tolerance POST-PREDICATE on the
    * single as-of result — provably equivalent to a bounded-range max
    * (the as-of pick is the NEWEST candidate; if it is too old, every
    * other candidate is older still), so the one-shuffle union-window
    * plan is reused verbatim and the bound costs zero extra exchanges. */
  def latestWithin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, out: String,
                   toleranceUs: Long): DataFrame = {
    require(toleranceUs >= 0, s"negative tolerance $toleranceUs")
    latestAtOrBefore(left, right, key, leftTs, rightTs, out)
      .withColumn(out, when(
        // NTZ-tolerant: under the engine's pinned UTC session tz the
        // TIMESTAMP cast is an identity on TIMESTAMP columns and the
        // wall-clock reading on TIMESTAMP_NTZ ones
        unix_micros(col(leftTs).cast("timestamp"))
          - unix_micros(col(out).cast("timestamp")) <= toleranceUs,
        col(out)))
  }
}
