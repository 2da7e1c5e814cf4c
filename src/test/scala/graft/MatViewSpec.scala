package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MatViewRewrite

/** Materialized-view rewrite (plans/MatViewRewrite): the rewritten query
  * must scan ONLY the summary table, produce bit-identical results, and
  * every out-of-scope shape must fall back to the base scan untouched. */
class MatViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import graft.Conv._

  private val baseDir = "target/graft-mvbase-spec"
  private val mvDir = "target/graft-mv-spec"

  private def setup(): Unit = {
    Tables(spark, TestSpark.Sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(baseDir)
    MatViewRewrite.create(spark, baseDir, mvDir,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sums = Seq(dec6(col("l_quantity")),
        dec6(col("l_extendedprice") * (lit(1.0) - col("l_discount")))),
      mins = Seq(col("l_shipdate")),
      maxs = Seq(col("l_orderkey")))
  }

  /** Root paths of every file scan in the executed plan, descending
    * through AQE wrappers and materialized query stages. */
  private def scanRoots(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec   => Seq(f)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case other                    => other.children.flatMap(scans)
    }
    df.collect()
    scans(df.queryExecution.executedPlan)
      .flatMap(_.relation.location.rootPaths.map(_.toString))
  }

  private def coarser() = spark.read.parquet(baseDir)
    .filter(col("l_returnflag") =!= "N")
    .groupBy("l_returnflag")
    .agg(count(lit(1)).as("n"),
      r4(sumDec6(col("l_quantity"))).as("sum_qty"),
      min(col("l_shipdate")).as("first_ship"),
      max(col("l_orderkey")).as("max_key"))
    .orderBy("l_returnflag")

  test("compatible aggregate is answered from the MV scan only") {
    setup()
    val roots = scanRoots(coarser())
    assert(roots.nonEmpty && roots.forall(_.contains("graft-mv-spec")),
      s"expected only MV scans, got: $roots")
  }

  test("rewritten results are identical to the rule-off plan") {
    setup()
    val rewritten = coarser().collect().toSeq
    MatViewRewrite.clear()
    val direct = coarser().collect().toSeq
    assert(rewritten == direct)
    setup()
  }

  test("grouping outside the MV group set falls back to the base scan") {
    setup()
    val df = spark.read.parquet(baseDir)
      .groupBy("l_returnflag", "l_orderkey")
      .agg(count(lit(1)).as("n"))
    val roots = scanRoots(df)
    assert(roots.forall(_.contains("graft-mvbase-spec")),
      s"ungroupable query must read the base: $roots")
  }

  test("uncovered aggregate (avg / unregistered measure) falls back") {
    setup()
    val df = spark.read.parquet(baseDir)
      .groupBy("l_returnflag")
      .agg(avg(col("l_discount")).as("a"))
    val roots = scanRoots(df)
    assert(roots.forall(_.contains("graft-mvbase-spec")),
      s"uncovered aggregate must read the base: $roots")
  }

  test("filter on a non-group column falls back") {
    setup()
    val df = spark.read.parquet(baseDir)
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
    val roots = scanRoots(df)
    assert(roots.forall(_.contains("graft-mvbase-spec")),
      s"non-group filter must read the base: $roots")
  }

  test("incremental refresh == full rebuild; rewrite targets gen-2") {
    val base2 = "target/graft-mvbase2-spec"
    val mv2 = "target/graft-mv2-spec"
    val li = Tables(spark, TestSpark.Sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus")
    val delta = li.filter(col("l_orderkey") % 10 === 0)
    li.filter(col("l_orderkey") % 10 =!= 0)
      .write.mode("overwrite").parquet(base2)
    MatViewRewrite.create(spark, base2, mv2,
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sums = Seq(dec6(col("l_quantity"))), maxs = Seq(col("l_orderkey")))
    delta.write.mode("append").parquet(base2)
    MatViewRewrite.refresh(spark, base2, delta)
    def q() = spark.read.parquet(base2)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        r4(sumDec6(col("l_quantity"))).as("sum_qty"),
        max(col("l_orderkey")).as("max_key"))
      .orderBy("l_returnflag")
    val roots = scanRoots(q())
    assert(roots.nonEmpty && roots.forall(_.contains("graft-mv2-spec/gen-2")),
      s"expected only gen-2 MV scans, got: $roots")
    val rewritten = q().collect().toSeq
    MatViewRewrite.deregister(base2)
    assert(q().collect().toSeq == rewritten)
  }

  test("distinct aggregate falls back") {
    setup()
    val df = spark.read.parquet(baseDir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_linestatus")).as("n"))
    val roots = scanRoots(df)
    assert(roots.forall(_.contains("graft-mvbase-spec")),
      s"distinct aggregate must read the base: $roots")
  }
}
