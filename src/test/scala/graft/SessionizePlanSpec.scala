package graft

import graft.plans.Sessionize
import graft.queries.StreamingQueries
import org.scalatest.funsuite.AnyFunSuite

class SessionizePlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sessionized = Sessionize(
    Tables(spark, TestSpark.Sf, "events").select("user_id", "ts"),
    key = "user_id", ts = "ts", gapSeconds = 1800L)

  test("custom physical operator == S03 window/groupBy form") {
    val batch = StreamingQueries.queries("s03_sessions")(spark, TestSpark.Sf)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    val custom = sessionized
      .selectExpr("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet
    assert(custom === batch)
  }

  test("plan shape: exactly one exchange, SessionizeExec present") {
    val plan = sessionized.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    assert(plan.contains("Sessionize"), s"custom operator missing:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
