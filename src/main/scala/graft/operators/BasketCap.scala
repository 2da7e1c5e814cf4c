package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Basket-size guard for bipartite co-occurrence projections (q102
  * market-basket rules, q104 co-purchase triangles): projecting
  * order→part pairs is quadratic in basket size, so ONE hot basket
  * (a crawler order with 10M parts) can dominate the whole job. The
  * guard keeps each basket's [[DefaultCap]] SMALLEST part ids — a
  * deterministic, declarative bound both engines replay identically
  * (row_number over (basket ORDER BY part) — no ties possible on a
  * distinct (basket, part) relation), so the capped projection is
  * still oracle-checkable data, not a sampling heuristic.
  *
  * Shape: a per-basket window rank — streaming rank over a sort, no
  * per-row array buffering (a collect_list cap would materialize the
  * hot basket in one row, recreating the problem as memory). The
  * window exchange is on the basket key, the same key the pair
  * self-join needs next, so the added exchange is reused.
  */
object BasketCap {

  /** Per-basket fan-out bound: caps pair fan-out at cap·(cap−1)/2
    * (= 2016 pairs) regardless of basket size. Far above any real
    * TPC-H-shaped basket (≤ 7 parts per order), so it never binds at
    * test scale — it is the 100 TB guard. */
  val DefaultCap = 64

  /** `rel` must be distinct on (basketCol, partCol); keeps each
    * basket's `cap` smallest parts. */
  def capParts(rel: DataFrame, basketCol: String, partCol: String,
               cap: Int = DefaultCap): DataFrame = {
    val w = Window.partitionBy(basketCol).orderBy(col(partCol))
    rel.withColumn("_bc_rn", row_number().over(w))
      .filter(col("_bc_rn") <= cap)
      .drop("_bc_rn")
  }

  /** The identical bound as DuckDB SQL (oracle side): wrap the distinct
    * (basket, part) CTE body. */
  def oracleQualify(basketCol: String, partCol: String,
                    cap: Int = DefaultCap): String =
    s"QUALIFY ROW_NUMBER() OVER (PARTITION BY $basketCol ORDER BY $partCol) <= $cap"
}
