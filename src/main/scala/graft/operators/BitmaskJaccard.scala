package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared dictionary-bitmask Jaccard kernel (used by Q28, qd1's exact
  * verify, and TrainingData.clean): encode each doc's distinct-token set
  * as an array of 64-bit words over a broadcast dictionary, then compare
  * pairs with popcount intersections — never a token-key shuffle join
  * (quadratic in token frequency: one stop token shared by every doc
  * makes that join O(n²) rows per token).
  *
  * The dictionary is assumed broadcastable (vocabulary ≪ corpus by
  * construction); the single-partition window that numbers it is over
  * vocab-sized data only.
  */
object BitmaskJaccard {

  /** (doc_id, tok) pairs → (doc_id, nt, m: Array[Long] bitmask). */
  def masks(toks: DataFrame): DataFrame = {
    val vocab = toks.select("tok").distinct()
      .withColumn("ti", row_number().over(Window.orderBy("tok")) - 1)
    val nWords = (vocab.count() + 63) / 64
    toks.join(broadcast(vocab), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nt"), collect_list(col("ti")).as("tis"))
      .select(col("doc_id"), col("nt"), expr(
        s"""transform(sequence(0, ${nWords - 1}),
           |  w -> aggregate(filter(tis, t -> t div 64 = w), 0L,
           |                 (acc, t) -> acc | shiftleft(1L, cast(t % 64 as int))))
           |""".stripMargin).as("m"))
  }

  /** Exact popcount intersection size of two mask arrays. */
  val interExpr: String =
    "aggregate(zip_with(ma, mb, (x, y) -> bit_count(x & y)), 0L, (acc, c) -> acc + CAST(c AS BIGINT))"

  /** All pairs (a < b) from `left` × `right` mask relations with Jaccard
    * ≥ num/den, with the implied integer length filter applied BEFORE the
    * popcount. Output: (a, b, inter, na, nb). */
  def pairs(left: DataFrame, right: DataFrame, num: Int, den: Int): DataFrame =
    left.select(col("doc_id").as("a"), col("nt").as("na"), col("m").as("ma"))
      .crossJoin(broadcast(right.select(
        col("doc_id").as("b"), col("nt").as("nb"), col("m").as("mb"))))
      .filter(col("a") < col("b")
        && lit(num) * col("na") <= lit(den) * col("nb")
        && lit(num) * col("nb") <= lit(den) * col("na"))
      .withColumn("inter", expr(interExpr))
      .filter(lit(den) * col("inter") >= lit(num) * (col("na") + col("nb") - col("inter")))
      .select("a", "b", "inter", "na", "nb")
}
