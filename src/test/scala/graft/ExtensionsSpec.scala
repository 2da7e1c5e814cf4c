package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-deploy entry point (`spark.sql.extensions=
  * graft.plans.GraftExtensions`) must install every graft native
  * function and the Sessionize planner strategy on a session that
  * never calls a register() method — the path a user's spark-submit
  * takes, where per-session registration code doesn't exist. */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtensionSession[A](f: SparkSession => A): A = {
    // `spark.sql.extensions` is a STATIC conf — it only takes effect on
    // the builder that creates the SparkContext, so TestSpark declares
    // it for the whole suite. newSession() builds a FRESH SessionState
    // from the same extensions object: its function registry contains
    // exactly what GraftExtensions injected and none of the temp
    // functions other specs' register() calls wrote — resolution below
    // is therefore attributable to the injection path alone.
    f(TestSpark.spark.newSession())
  }

  test("extensions session: native functions resolve in plain SQL, no register() calls") {
    withExtensionSession { s =>
      val r = s.sql(
        """SELECT roll_hash31('abc') AS h,
          |       dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
          |       intersect_sorted_count(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS i,
          |       first_common_sorted(array(1L, 5L, 7L), array(2L, 5L, 7L)) AS fc,
          |       fuzzy_min_ms('1854') AS fmin,
          |       fuzzy_max_ms('1854') AS fmax,
          |       crosstrack_m(0.0D, 0.0D, -0.001D, 0.0D, 0.001D, 0.0D) AS ct
          |""".stripMargin).collect()(0)
      // values cross-checked against the register()-path expressions
      // the oracle-gated queries already hash-verify
      assert(r.getLong(1) === 4L * 1 + 5 * 2 + 6 * 3)
      assert(r.getLong(2) === 2L)
      assert(r.getLong(3) === 5L)
      assert(r.getLong(4) < r.getLong(5), "fuzzy year must span an interval")
      assert(math.abs(r.getDouble(6)) < 1e-6, "point on the segment has crosstrack 0")
      // the aggregate functions injected as builders resolve too
      val agg = s.sql(
        """SELECT simhash_bands64(h) AS sb, hyperplane_bands64(id, h) AS hb
          |FROM (SELECT id, roll_hash31(CAST(id AS STRING)) AS h FROM range(10))
          |""".stripMargin).collect()(0)
      assert(!agg.isNullAt(0) && !agg.isNullAt(1))
    }
  }

  test("extensions session: Sessionize strategy is planner-installed") {
    withExtensionSession { s =>
      assert(s.sessionState.planner.strategies
        .contains(graft.plans.SessionizeStrategy),
        "SessionizeStrategy not injected by GraftExtensions")
    }
  }
}
