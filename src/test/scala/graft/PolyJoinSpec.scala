package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.geo.{GeoQueries, PolyJoin}

/** Verdict-r8 item 8: the point-in-polygon join needs a partitioned
  * path for when the polygon relation outgrows broadcast. Pins:
  * (a) gridAssign == broadcastAssign row-for-row on the committed
  * fixture (overlapping polygons + misses included) and at a cell size
  * that forces multi-cell bboxes; (b) the grid path's physical plan
  * contains NO broadcast of the polygon side and no nested-loop join —
  * candidates come from the (cx, cy) equi-join; (c) the strategy
  * selector switches on the hint. */
class PolyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def edges = {
    import spark.implicits._
    GeoQueries.g08Edges.toDF("rid", "xi", "yi", "xj", "yj")
  }

  private def pts = GeoQueries.housePoints(spark)
    .select(col("hn_id").as("id"), col("px"), col("py"))

  test("gridAssign == broadcastAssign on the fixture, two cell sizes") {
    val want = PolyJoin.broadcastAssign(pts, edges)
      .orderBy("id").collect().toSeq
    assert(want.nonEmpty)
    // regions must be non-trivial for the equality to mean anything
    val regions = want.map(_.getLong(3)).distinct.sorted
    assert(regions.size >= 3, s"fixture must hit several regions, got $regions")
    for (cell <- Seq(0.01, 0.003)) {
      val got = PolyJoin.gridAssign(pts, edges, cell)
        .orderBy("id").collect().toSeq
      assert(got == want, s"grid path diverges at cell=$cell")
    }
  }

  test("grid path plan: no broadcast of the polygon side, no nested loop") {
    val plan = PolyJoin.gridAssign(pts, edges)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"grid path must not plan a nested-loop/cartesian join:\n$plan")
    // the candidate generation must be the (cx, cy) equi-join
    assert(plan.contains("cx") && plan.contains("cy"))
  }

  test("selector: broadcast under the hint, grid above it") {
    val small = PolyJoin.assign(pts, edges, edgeCountHint = 16)
    assert(small.queryExecution.sparkPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val large = PolyJoin.assign(pts, edges, edgeCountHint = 10000000L)
    assert(!large.queryExecution.sparkPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("boundary semantics: points outside every bbox land in region 0 via the grid path") {
    import spark.implicits._
    val far = Seq((900L, 10.0, 10.0), (901L, -74.005, 40.715))
      .toDF("id", "px", "py")
    val got = PolyJoin.gridAssign(far, edges)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got.head == ((900L, 0L)), "a far point must assign region 0")
    assert(got(1)._2 == 1L, "the diamond-1 centroid must assign region 1")
  }
}
