package graft

import graft.operators.AsOfJoin
import graft.queries.Relational
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("window-over-union as-of join == Q10 correlated scalar subquery") {
    val q10 = Relational.queries("q10_asof")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> String.valueOf(r.get(1))).toMap
    val events = Tables(spark, TestSpark.Sf, "events")
      .selectExpr("event_id", "user_id AS o_custkey", "ts")
    val orders = Tables(spark, TestSpark.Sf, "orders")
      .select("o_custkey", "o_orderdate")
    val asof = AsOfJoin.latestAtOrBefore(events, orders,
      key = "o_custkey", leftTs = "ts", rightTs = "o_orderdate",
      out = "last_order")
      .collect().map(r => r.getLong(r.fieldIndex("event_id")) ->
        String.valueOf(r.get(r.fieldIndex("last_order")))).toMap
    assert(asof.keySet === q10.keySet)
    q10.foreach { case (id, v) =>
      assert(asof(id) === v, s"mismatch for event $id")
    }
  }

  test("internal column names never collide with caller columns") {
    import org.apache.spark.sql.functions._
    // left carries the previously-internal names _ts/_isRight/_val as
    // REAL payload columns; they must pass through untouched
    val events = Tables(spark, TestSpark.Sf, "events")
      .selectExpr("event_id", "user_id AS o_custkey", "ts",
        "event_id AS _ts", "event_id AS _isRight", "event_id AS _val")
    val orders = Tables(spark, TestSpark.Sf, "orders")
      .select("o_custkey", "o_orderdate")
    val out = AsOfJoin.latestAtOrBefore(events, orders,
      key = "o_custkey", leftTs = "ts", rightTs = "o_orderdate",
      out = "last_order")
    assert(Seq("_ts", "_isRight", "_val").forall(out.columns.contains))
    val r = out.where(col("event_id") === col("_ts")).count()
    assert(r === out.count(), "payload columns named like internals were clobbered")
    // an output name colliding with a left column is rejected loudly
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.latestAtOrBefore(events, orders, "o_custkey", "ts", "o_orderdate",
        out = "event_id")
    }
    assert(ex.getMessage.contains("collides"))
    // including out == leftTs (would duplicate the probe-ts column name)
    val ex2 = intercept[IllegalArgumentException] {
      AsOfJoin.latestAtOrBefore(events, orders, "o_custkey", "ts", "o_orderdate",
        out = "ts")
    }
    assert(ex2.getMessage.contains("collides"))
  }
}
