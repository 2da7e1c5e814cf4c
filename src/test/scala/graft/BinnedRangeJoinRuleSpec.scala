package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The conf-gated optimizer rewrite must turn a naive inequality join
  * (which Spark plans as BroadcastNestedLoopJoin) into the binned
  * equi-join, with bit-identical results — and must REFUSE every shape
  * where the rewrite could change semantics or is pointless. Runs on a
  * `newSession()` so the `spark.graft.rangeJoin.binWidth` session conf
  * never leaks into other specs. */
class BinnedRangeJoinRuleSpec extends AnyFunSuite {

  private def withRuleSession[A](binWidth: Long)(f: SparkSession => A): A = {
    val s = TestSpark.spark.newSession()
    if (binWidth > 0)
      s.conf.set(graft.plans.BinnedRangeJoinRule.ConfKey, binWidth.toString)
    f(s)
  }

  private def iv(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((1L, 0L, 9L), (2L, 5L, 24L), (3L, 10L, 10L), (4L, 17L, 42L),
        (5L, 31L, 30L), // hi < lo: matches nothing, must not throw
        (6L, 100L, 105L)).toDF("i_id", "s", "e")
  }
  private def pts(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((10L, 0L), (11L, 9L), (12L, 10L), (13L, 24L), (14L, 25L),
        (15L, 31L), (16L, 55L), (17L, 105L)).toDF("p_id", "p")
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  private def naive(s: SparkSession, joinType: String = "inner"): DataFrame =
    pts(s).join(iv(s), col("p") >= col("s") && col("p") <= col("e"), joinType)
      .select("p_id", "i_id")

  test("inner: rewritten to a binned equi-join, results identical to the BNLJ plan") {
    val expected = withRuleSession(0)(s => rows(naive(s)))
    withRuleSession(10) { s =>
      val j = naive(s)
      assert(rows(j) === expected)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"rule did not rewrite:\n$p")
    }
  }

  test("left outer with the point side preserved: rewritten, null rows intact") {
    val expected = withRuleSession(0)(s => rows(naive(s, "left")))
    withRuleSession(10) { s =>
      val j = naive(s, "left")
      assert(rows(j) === expected)
      assert(j.filter(col("i_id").isNull).count() > 0)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), s"rule did not rewrite:\n$p")
    }
  }

  test("left outer with the REPLICATED side preserved: refused (would duplicate null rows)") {
    withRuleSession(10) { s =>
      val j = iv(s).join(pts(s),
        col("p") >= col("s") && col("p") <= col("e"), "left")
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastNestedLoopJoin"), s"unsafe rewrite happened:\n$p")
    }
  }

  test("a cross-side equi conjunct disables the rewrite (hash join already possible)") {
    withRuleSession(10) { s =>
      val j = pts(s).join(iv(s),
        col("p_id") === col("i_id")
          && col("p") >= col("s") && col("p") <= col("e"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Generate"), s"rewrote a join that already has an equi key:\n$p")
    }
  }

  test("timestamp bounds: the natural SQL interval spelling rewrites on epoch-micro bins") {
    def q(s: SparkSession) = {
      val e = Tables(s, TestSpark.Sf, "events")
      val v = e.filter(col("event_type") === "view")
        .select(col("ts").as("v_ts"), col("event_id").as("v_id"))
      val p = e.filter(col("event_type") === "purchase")
        .select(col("ts").as("p_ts"), col("event_id").as("p_id"))
      p.join(v, col("p_ts") >= col("v_ts")
        && col("p_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
        .select("p_id", "v_id")
    }
    val expected = withRuleSession(0)(s => rows(q(s)))
    withRuleSession(600000000L) { s =>
      val j = q(s)
      assert(rows(j) === expected)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"timestamp range join not rewritten:\n$p")
    }
  }

  test("conf unset: strict no-op") {
    withRuleSession(0) { s =>
      val p = naive(s).queryExecution.executedPlan.toString
      assert(p.contains("BroadcastNestedLoopJoin"), p)
    }
  }
}
