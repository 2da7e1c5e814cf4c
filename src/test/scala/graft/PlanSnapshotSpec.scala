package graft

import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Plan-SNAPSHOT regression harness (round-6 verdict item #5):
  * PlanShapeSpec pins ~30 hand-chosen properties on ~25 queries; this
  * spec pins a normalized operator-multiset fingerprint of EVERY
  * query's physical plan, so any silent plan regression — a lost
  * broadcast, a new exchange, a window where an aggregate was — fails
  * the suite even for queries with no hand-written pin.
  *
  * The fingerprint counts only plan-shape-bearing operators (joins by
  * type, exchanges, sorts, generates, windows, aggregates, top-k,
  * cache scans); projections/filters/scans are deliberately excluded
  * so refactors that do not change the execution shape do not churn
  * the snapshot. Fingerprints are taken from `sparkPlan` (pre-AQE):
  * deterministic without executing, and conservative — AQE can only
  * improve on it at runtime.
  *
  * Regen path (one line, after an INTENTIONAL plan change):
  *   REGEN_PLANS=1 sbt "testOnly graft.PlanSnapshotSpec"
  */
class PlanSnapshotSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val SnapshotPath =
    java.nio.file.Paths.get("src/test/resources/plan_fingerprints.txt")

  private val tracked = Set(
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "Exchange", "BroadcastExchange",
    "Sort", "Generate", "Window", "Expand",
    "HashAggregate", "ObjectHashAggregate", "SortAggregate",
    "TakeOrderedAndProject", "InMemoryTableScan")

  private def fingerprint(p: SparkPlan): String = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    def visit(n: SparkPlan): Unit = {
      if (tracked(n.nodeName)) counts(n.nodeName) += 1
      n.children.foreach(visit)
    }
    visit(p)
    counts.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
  }

  test("every query's physical plan shape matches its snapshot") {
    graft.operators.OpCaches.releaseAll()
    spark.catalog.clearCache()
    val current = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val fp = fingerprint(fn(spark, TestSpark.Sf).queryExecution.sparkPlan)
      // each query's own tracked caches are released so one query's
      // cached relations never change the next one's plan
      graft.operators.OpCaches.releaseAll()
      spark.catalog.clearCache()
      name -> fp
    }
    val rendered = current
      .map { case (n, f) => s"$n $f" }.mkString("", "\n", "\n")
    if (sys.env.get("REGEN_PLANS").contains("1")) {
      java.nio.file.Files.createDirectories(SnapshotPath.getParent)
      java.nio.file.Files.writeString(SnapshotPath, rendered)
      info(s"regenerated $SnapshotPath (${current.size} queries)")
    } else {
      assert(java.nio.file.Files.exists(SnapshotPath),
        s"no plan snapshot at $SnapshotPath — create it with " +
          "REGEN_PLANS=1 sbt \"testOnly graft.PlanSnapshotSpec\"")
      val saved = java.nio.file.Files.readString(SnapshotPath)
        .split("\n").filter(_.nonEmpty)
        .map { line =>
          val parts = line.split(" ", 2)
          parts(0) -> (if (parts.length > 1) parts(1) else "")
        }.toMap
      val cur = current.toMap
      val missing = (cur.keySet -- saved.keySet).toSeq.sorted
      val stale = (saved.keySet -- cur.keySet).toSeq.sorted
      assert(missing.isEmpty,
        s"queries without a plan snapshot (REGEN_PLANS=1 to add): $missing")
      assert(stale.isEmpty, s"snapshots for removed queries: $stale")
      val diffs = current.collect {
        case (n, f) if saved(n) != f =>
          s"$n:\n  snapshot: ${saved(n)}\n  current:  $f"
      }
      assert(diffs.isEmpty,
        "plan shapes changed — if intentional, accept with REGEN_PLANS=1 " +
          "sbt \"testOnly graft.PlanSnapshotSpec\":\n" + diffs.mkString("\n"))
    }
  }
}
