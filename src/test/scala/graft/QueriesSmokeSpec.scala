package graft

import org.scalatest.funsuite.AnyFunSuite

/** t1-style smoke inside the test suite: every registered query must
  * execute at sf0.001 (schema resolution, expression binding, oracle-free).
  * Catches per-query regressions without the Python harness. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every SparkEntry query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, TestSpark.Sf).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, s"failing queries:\n${failures.mkString("\n")}")
  }
}
