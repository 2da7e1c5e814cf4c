package graft

import graft.operators.{OpCaches, TrainingData}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composition of the training-data pipeline the individual
  * oracles verify piecewise: clean (quality gate → exact dedup →
  * cluster near-dedup) → chunk (64/48 windows + fingerprints) → exact
  * chunk dedup → greedy sequence packing. Asserts the cross-stage
  * invariants a corpus pipeline relies on — the "a user of the
  * reference could run their whole pipeline on this" story, as one
  * executable test. */
class TrainingPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clean -> chunk -> dedup -> pack composes with conserved invariants") {
    val docs = Tables(spark, TestSpark.Sf, "documents")
    val nDocs = docs.count()

    // 1. clean with cluster-based near-dedup
    val (cleaned, statsF) = TrainingData.clean(docs, clusterDedup = true)
    val cleanedC = cleaned.cache()
    val nClean = cleanedC.count()
    val stats = statsF()
    assert(stats.output === nClean && nClean > 0 && nClean <= nDocs)

    // 2. chunk the survivors; every chunk's doc must be a survivor and
    // every survivor must produce >= 1 chunk
    val chunks = graft.queries.TextExt.chunkRel(cleanedC).cache()
    assert(chunks.join(cleanedC, Seq("doc_id"), "left_anti").count() === 0)
    assert(chunks.select("doc_id").distinct().count() === nClean)
    // chunk token counts: 1..64, and per-doc totals reconstruct the doc
    // length under the 16-token overlap (sum of chunk sizes >= doc size)
    assert(chunks.filter(col("n_tok") < 1 || col("n_tok") > 64).count() === 0)

    // 3. exact chunk dedup by fingerprint, keep least (doc_id, k)
    val wF = Window.partitionBy("fp").orderBy("doc_id", "k")
    val dedup = chunks.withColumn("rn", row_number().over(wF))
      .where(col("rn") === 1).drop("rn").cache()
    val nDedup = dedup.count()
    assert(nDedup === chunks.select("fp").distinct().count())
    assert(nDedup <= chunks.count())

    // 4. greedy 2048-token packing of surviving chunks (qt7's shape,
    // keyed by doc order): every pack except possibly each stream's
    // last must hold > 2048 - 64 tokens (greedy never leaves a gap a
    // whole next chunk could fill... a pack closes only when the
    // cumulative count crosses the boundary)
    val wP = Window.orderBy("doc_id", "k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = dedup
      .withColumn("cum", sum(col("n_tok")).over(wP))
      .withColumn("pack_id", expr("(cum - n_tok) div 2048"))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tok")).as("n_tokens"))
      .cache()
    val total = packed.agg(sum("n_tokens")).first().getLong(0)
    assert(total === dedup.agg(sum("n_tok")).first().getLong(0),
      "packing must conserve tokens")
    val lastPack = packed.agg(max("pack_id")).first().getLong(0)
    // every non-final pack spans the 2048 boundary by construction:
    // its last chunk's cum crossed into the next pack's range
    assert(packed.filter(col("pack_id") < lastPack
      && col("n_tokens") < 2048 - 64).count() === 0)

    chunks.unpersist(); dedup.unpersist(); packed.unpersist(); cleanedC.unpersist()
    OpCaches.releaseAll()
  }
}
