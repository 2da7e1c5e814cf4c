package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (latest right-side event at or before each left timestamp)
  * as a single window pass over a tagged union (SURVEY §2B "as-of" row).
  *
  * Why not the correlated-scalar-subquery form (Q10)? Catalyst
  * decorrelates it into an aggregate-then-join per distinct predicate —
  * correct, but it re-aggregates the whole right side. The union form
  * shuffles each row exactly once on the key and resolves every probe
  * with one running `last(ignoreNulls)` — the classic time-series shape
  * that survives a 100× scale-up (one shuffle, no re-aggregation, and
  * per-key skew is bounded by the window sort).
  *
  * Tie rule: a right row at exactly the probe timestamp matches
  * (`<=` semantics) — right rows sort before left rows at equal ts.
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (its `rightTs` is also the payload)
    * @param key       equi-join key column name (same name both sides)
    * @param leftTs    probe timestamp column in `left`
    * @param rightTs   reference timestamp column in `right`
    * @param out       output column name for the matched right timestamp
    */
  def latestAtOrBefore(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       out: String): DataFrame = {
    val probeExtra = left.columns.filterNot(c => c == key || c == leftTs).toSeq
    val valT = right.schema(rightTs).dataType
    val rightSide = right.select(
      (Seq(col(key), col(rightTs).as("_ts"), lit(1).as("_isRight"),
        col(rightTs).as("_val")) ++
        probeExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val leftSide = left.select(
      (Seq(col(key), col(leftTs).as("_ts"), lit(0).as("_isRight"),
        lit(null).cast(valT).as("_val")) ++
        probeExtra.map(col)): _*)
    val w = Window.partitionBy(key)
      .orderBy(col("_ts"), col("_isRight").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rightSide.unionByName(leftSide)
      .withColumn(out, last(col("_val"), ignoreNulls = true).over(w))
      .where(col("_isRight") === 0)
      .select((Seq(col(key), col("_ts").as(leftTs)) ++ probeExtra.map(col)
        :+ col(out)): _*)
  }
}
