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
}
