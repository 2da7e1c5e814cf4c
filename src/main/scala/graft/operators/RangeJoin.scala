package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-replicated range joins — the scale path for interval predicates
  * with NO equi-key conjunct.
  *
  * Spark plans a join whose condition is pure inequalities as a
  * BroadcastNestedLoopJoin (or a cartesian product): O(|A|·|B|)
  * comparisons and an unbounded broadcast — the canonical 100 TB
  * scale-killer. The classic fix (used by every warehouse's "range join
  * optimization") is bin replication: chop the number line into
  * fixed-width bins, replicate each interval into every bin it touches,
  * tag each point (or interval) with its bin, and equi-join ON THE BIN —
  * a plain shuffled hash/sort-merge join whose per-key cardinality is
  * bounded by bin occupancy, not table size. The exact predicate is kept
  * as a residual conjunct, so results are identical to the naive join.
  *
  * Pair-uniqueness needs no distinct (no post-join dedup exchange):
  *  - point-in-interval: a point lives in exactly ONE bin, so each
  *    qualifying (interval, point) pair meets in exactly one bin;
  *  - interval-interval: two overlapping intervals both cover the bin of
  *    `greatest(startA, startB)` (overlap ⟺ max(start) ≤ min(end)), so
  *    the join keeps a pair only in that first common bin.
  *
  * Pick `binWidth` ≈ the typical interval length: each interval then
  * replicates into ≤ 2 bins (`len/W + 1` in general), and a bin's match
  * candidates stay local. All bounds are inclusive ([start, end]).
  */
object RangeJoin {

  private def bin(c: Column, w: Long): Column = floor(c / lit(w)).cast("long")

  /** Bin list of one interval. Guarded on the RAW bounds: a reversed
    * (hi < lo) or null-bounded interval explodes to ZERO bins — Spark's
    * `sequence` would otherwise DESCEND for reversed bounds, and a
    * bin-level guard would miss a reversal that stays inside one bin
    * (caught by RangeJoinPropSpec: the overlap predicate alone can
    * match a same-bin reversed interval that the [lo,hi] contract says
    * is empty). */
  private def bins(lo: Column, hi: Column, w: Long): Column =
    when(lo <= hi, sequence(bin(lo, w), bin(hi, w)))
      .otherwise(array().cast("array<long>"))

  /** Join `points` (one numeric column `pointCol`, e.g. epoch micros) to
    * `intervals` ([startCol, endCol] closed) on containment, with no
    * equi key. `joinType` "inner" or "left" (left keeps unmatched
    * points with null interval columns — the bin conjunct stays an
    * equi-join, so left-outer is still a single SMJ/SHJ, not a BNLJ).
    * Column names across the two inputs must be disjoint. */
  def binnedPointJoin(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long, joinType: String = "inner"): DataFrame = {
    val iv = intervals.withColumn("_bin",
      explode(bins(col(startCol), col(endCol), binWidth)))
    val pt = points.withColumn("_pbin", bin(col(pointCol), binWidth))
    pt.join(iv,
        pt("_pbin") === iv("_bin")
          && col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol),
        joinType)
      .drop("_bin", "_pbin")
  }

  /** Join two interval relations on overlap ([aStart,aEnd] ∩
    * [bStart,bEnd] ≠ ∅), no equi key. Each overlapping pair emits
    * exactly once (first-common-bin rule). A reversed (end < start) or
    * null-bounded interval is EMPTY and overlaps nothing — note this is
    * strictly tighter than the raw predicate aStart ≤ bEnd ∧ bStart ≤
    * aEnd, which a reversed interval can satisfy. Inner join only — an
    * unmatched interval has no "first common bin" to anchor a null row;
    * express left-outer needs via a separate anti-join on the same
    * binned condition. */
  def binnedOverlapJoin(a: DataFrame, aStart: String, aEnd: String,
                        b: DataFrame, bStart: String, bEnd: String,
                        binWidth: Long): DataFrame = {
    val ab = a.withColumn("_abin",
      explode(bins(col(aStart), col(aEnd), binWidth)))
    val bb = b.withColumn("_bbin",
      explode(bins(col(bStart), col(bEnd), binWidth)))
    ab.join(bb,
        ab("_abin") === bb("_bbin")
          && col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd)
          && ab("_abin") === greatest(bin(col(aStart), binWidth),
                                      bin(col(bStart), binWidth)))
      .drop("_abin", "_bbin")
  }
}
