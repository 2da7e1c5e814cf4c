package graft

import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.FkJoinElimRule

/** FkJoinElimRule (sixth injected rule): a column-dead inner dim join
  * under a declared FK disappears from the optimized plan; every scope
  * guard keeps the join when elimination would be unsound. Result
  * equality vs the join form is pinned here at spec scale and by the
  * q126 oracle hash at the gate. */
class JoinElimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Sf = TestSpark.Sf

  private def joins(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  private def session() = {
    val s = spark.newSession()
    s.conf.set(FkJoinElimRule.ConfKey, "l_orderkey=o_orderkey")
    s
  }

  test("declared FK + column-dead dim side: join eliminated, result identical") {
    val s = session()
    val li = Tables(s, Sf, "lineitem")
    val o = Tables(s, Sf, "orders").select(col("o_orderkey"))
    val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(joins(joined) === 0, "declared FK join must be eliminated")

    // same query WITHOUT the declaration keeps its join and agrees
    val s2 = spark.newSession()
    val li2 = Tables(s2, Sf, "lineitem")
    val o2 = Tables(s2, Sf, "orders").select(col("o_orderkey"))
    val base = li2.join(o2, li2("l_orderkey") === o2("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(joins(base) === 1)
    val a = joined.orderBy("l_returnflag").collect().toSeq
    val b = base.orderBy("l_returnflag").collect().toSeq
    assert(a === b)
  }

  test("guard: dim column referenced above the join => no elimination") {
    val s = session()
    val li = Tables(s, Sf, "lineitem")
    val o = Tables(s, Sf, "orders").select(col("o_orderkey"), col("o_custkey"))
    val q = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    assert(joins(q) === 1)
  }

  test("guard: filtered dim side => no elimination") {
    val s = session()
    val li = Tables(s, Sf, "lineitem")
    val o = Tables(s, Sf, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val q = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(joins(q) === 1)
  }

  test("guard: undeclared key pair => no elimination") {
    val s = session()
    val li = Tables(s, Sf, "lineitem")
    val p = Tables(s, Sf, "part").select(col("p_partkey"))
    val q = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(joins(q) === 1)
  }

  test("guard: outer join => no elimination") {
    val s = session()
    val li = Tables(s, Sf, "lineitem")
    val o = Tables(s, Sf, "orders").select(col("o_orderkey"))
    val q = li.join(o, li("l_orderkey") === o("o_orderkey"), "left")
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(joins(q) === 1)
  }

  test("null fk rows are dropped exactly as the inner join drops them") {
    val s = session()
    import s.implicits._
    // fact with a null fk row; dim declared as the FK target by NAME
    s.conf.set(FkJoinElimRule.ConfKey, "fk=pk")
    val fact = Seq((Some(1L), "a"), (None: Option[Long], "b"), (Some(2L), "c"))
      .toDF("fk", "tag")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val q = fact.join(dim, fact("fk") === dim("pk")).select(col("tag"))
    assert(joins(q) === 0, "declared FK join must be eliminated")
    assert(q.orderBy("tag").collect().map(_.getString(0)).toSeq
      === Seq("a", "c"))
  }
}
