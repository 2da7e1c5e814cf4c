package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for two round-8 scale dodges whose correctness the
  * oracle proves only on the fixture:
  *
  *  - qx10's TWO-PHASE top-k (per-(group, salt) top-C, then re-rank
  *    the survivors) must equal the straight single-window top-k for
  *    ANY data — the pigeonhole argument (a group's true top-C has at
  *    most C members in any salt slice) holds for every salt count and
  *    every tie pattern, so this is checked on adversarial random data
  *    with heavy ties.
  *
  *  - qd15's prefix size: if B misses all of A's first
  *    na − ceil(0.8·na) + 1 elements in ANY fixed total order, then
  *    |A∩B| < 0.8·na — verified exhaustively on random sets.
  */
class TwoPhaseTopKPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two-phase salted top-k == single-window top-k on random data with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val cap = 7
    // 2000 rows, 5 groups, priorities drawn from a SMALL range so ties
    // are common and the (pr, id) tiebreak is load-bearing
    val rows = (0 until 2000).map { i =>
      (s"g${rnd.nextInt(5)}", i.toLong, rnd.nextInt(40).toLong)
    }
    val df = rows.toDF("grp", "id", "pr")
    val w1 = Window.partitionBy(col("grp"), pmod(col("id"), lit(8L)))
      .orderBy("pr", "id")
    val w2 = Window.partitionBy("grp").orderBy("pr", "id")
    val twoPhase = df.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= cap)
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= cap)
      .select("grp", "id", "rk")
    val single = df.withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= cap)
      .select("grp", "id", "rk")
    val a = twoPhase.orderBy("grp", "rk").collect().toSeq
    val b = single.orderBy("grp", "rk").collect().toSeq
    assert(a == b, s"two-phase ${a.size} vs single ${b.size}")
  }

  test("qd15 prefix-filter bound: missing the whole prefix caps the intersection below 0.8·|A|") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 1 to 2000) {
      val na = 1 + rnd.nextInt(30)
      val a = rnd.shuffle((0 until 100).toList).take(na)
      // prefix under the fixed total order = first pa elements of a's
      // (arbitrary) canonical order; B = any set avoiding that prefix
      val pa = na - ((4 * na + 4) / 5) + 1
      val bPool = (0 until 100).toSet -- a.take(pa)
      val b = rnd.shuffle(bPool.toList).take(rnd.nextInt(bPool.size + 1)).toSet
      val inter = a.count(b.contains)
      // 5·inter >= 4·na is the keep rule — it must be impossible here
      assert(5 * inter < 4 * na,
        s"prefix bound violated: na=$na pa=$pa inter=$inter")
    }
  }
}
