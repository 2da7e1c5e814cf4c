package graft

import graft.operators.Scale
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted count/sum equal plain groupBy on skewed data") {
    import spark.implicits._
    // one hot key with 10k rows, a long tail of singletons
    val df = (Seq.fill(10000)("hot") ++ (1 to 500).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "v")
    val plainC = df.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedC = Scale.saltedCount(df, "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedC === plainC)
    val plainS = df.groupBy("k").sum("v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedS = Scale.saltedSum(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedS === plainS)
  }

  test("same-bucketed tables join without a shuffle") {
    val orders = Tables(spark, TestSpark.Sf, "orders")
    val lineitem = Tables(spark, TestSpark.Sf, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Scale.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Scale.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    val joined = Scale.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // and it still computes the right thing
    val li = Tables(spark, TestSpark.Sf, "lineitem")
    val m = li.join(orders, li("l_orderkey") === orders("o_orderkey")).count()
    assert(joined.count() === m)
    // clean the default warehouse (tables live under ./spark-warehouse)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
