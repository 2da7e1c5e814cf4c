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

  test("NULL key/ts rows are dropped, not merged into key 0") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType, nullable = true),
      StructField("ts", TimestampType, nullable = true)))
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      Row(1L, t("2024-01-01 10:00:00")),
      Row(1L, t("2024-01-01 10:10:00")),
      Row(null, t("2024-01-01 10:00:00")), // null key
      Row(0L, t("2024-01-01 12:00:00")),   // REAL key 0
      Row(2L, null))                       // null ts
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = Sessionize(df, "user_id", "ts", 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toList.sorted
    // user 1: one 2-event session; user 0: its own 1-event session;
    // the null-key and null-ts rows are gone (NOT folded into key 0)
    assert(out === List((0L, 1L), (1L, 2L)))
  }

  test("plan shape: exactly one exchange, SessionizeExec present") {
    val plan = sessionized.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    assert(plan.contains("Sessionize"), s"custom operator missing:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
