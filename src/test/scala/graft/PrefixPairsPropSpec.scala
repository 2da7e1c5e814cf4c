package graft

import graft.operators.BitmaskJaccard
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style exactness guard for the prefix-filter candidate
  * generation: on randomized corpora from BOTH degenerate regimes —
  * tiny uniform vocabulary (few join keys, the skew case the ppjoin
  * position filter exists for) and large sparse vocabulary (the case
  * prefix filtering is designed for) — `prefixPairs` must return
  * exactly the same (a, b, inter, na, nb) rows as the brute-force
  * all-pairs kernel, at several thresholds. Deterministic seeds: a
  * failure reproduces. */
class PrefixPairsPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus(seed: Long, nDocs: Int, vocab: Int,
                     minLen: Int, maxLen: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until nDocs).map { i =>
      val n = minLen + rnd.nextInt(maxLen - minLen + 1)
      (i.toLong, Seq.fill(n)(s"t${rnd.nextInt(vocab)}").mkString(" "))
    }
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def check(seed: Long, nDocs: Int, vocab: Int,
                    minLen: Int, maxLen: Int, num: Int, den: Int): Unit = {
    val toks = corpus(seed, nDocs, vocab, minLen, maxLen)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct().cache()
    val masks = BitmaskJaccard.masks(toks).cache()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b", "inter", "na", "nb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
    val brute = rows(BitmaskJaccard.pairs(masks, masks, num, den))
    val prefix = rows(BitmaskJaccard.prefixPairs(toks, masks, num, den))
    assert(prefix === brute,
      s"seed=$seed vocab=$vocab J>=$num/$den: " +
        s"missing=${(brute diff prefix).take(3)} extra=${(prefix diff brute).take(3)}")
    // the fused single-aggregation form must be row-identical too
    val fused = rows(BitmaskJaccard.prefixPairsFused(toks, num, den))
    assert(fused === brute,
      s"fused seed=$seed vocab=$vocab J>=$num/$den: " +
        s"missing=${(brute diff fused).take(3)} extra=${(fused diff brute).take(3)}")
    spark.catalog.clearCache()
  }

  test("tiny uniform vocabulary (skew regime): prefix == brute force") {
    // near-identical token sets everywhere — maximal join-key collision
    check(seed = 1, nDocs = 120, vocab = 12, minLen = 8, maxLen = 20, num = 8, den = 10)
    check(seed = 2, nDocs = 120, vocab = 12, minLen = 8, maxLen = 20, num = 5, den = 10)
  }

  test("large sparse vocabulary (selective regime): prefix == brute force") {
    check(seed = 3, nDocs = 150, vocab = 2000, minLen = 5, maxLen = 40, num = 8, den = 10)
    check(seed = 4, nDocs = 150, vocab = 2000, minLen = 5, maxLen = 40, num = 6, den = 10)
  }

  test("duplicate-heavy corpus (identical sets): prefix == brute force") {
    // vocab 3, short docs — many EXACT duplicate token sets (J = 1 pairs)
    check(seed = 5, nDocs = 80, vocab = 3, minLen = 2, maxLen = 5, num = 8, den = 10)
  }
}
