package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupIndex, SnapTable}
import graft.queries.{StreamingQueries, Streams}

/** S17: the composed ingest pipeline (dedup verdicts against the
  * persisted index → index upsert → atomic snapshot publish) — the
  * streamed two-batch run must equal the s17 batch replay across a
  * checkpointed restart, with each publish an isolated version. */
class IngestPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("s17 streamed ingest == batch replay across restart; versions isolate batches") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
    val isA = col("doc_id") % 10 === 3
    val isB = col("doc_id") % 10 === 7
    val tmp = java.nio.file.Files.createTempDirectory("graft-s17").toString
    val (idxDir, tableDir, inDir, cp) =
      (s"$tmp/index", s"$tmp/table", s"$tmp/in", s"$tmp/cp")

    DedupIndex.write(docs.filter(!isA && !isB), idxDir)
    try {
      docs.filter(isA).coalesce(1).write.parquet(inDir)
      Streams.s17(spark, idxDir, tableDir, inDir, cp)
      assert(SnapTable.latestVersion(spark, tableDir) == 1)
      // restart: batch B staged, same checkpoint — A skipped, index
      // already grown with A's acceptances
      docs.filter(isB).coalesce(1).write.mode("append").parquet(inDir)
      Streams.s17(spark, idxDir, tableDir, inDir, cp)
      assert(SnapTable.latestVersion(spark, tableDir) == 2)

      val got = SnapTable.read(spark, tableDir)
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      // the oracle-gated batch form publishes the same membership
      graft.operators.OpCaches.releaseAll()
      val agg = StreamingQueries.queries("s17_ingestpipeline")(spark, TestSpark.Sf)
        .collect().map(_.toSeq).toSeq
      graft.operators.OpCaches.releaseAll()
      val batchTable = SnapTable.read(spark,
          "target/graft-ingest/" + TestSpark.Sf.replaceAll("[^A-Za-z0-9]", "_"))
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
        .collect().map(_.toSeq).toSeq
      assert(got == batchTable,
        "streamed snapshot membership diverges from the batch replay")
      assert(agg.nonEmpty)
      // version isolation: v1 holds only batch A's acceptances
      val v1Ids = SnapTable.read(spark, tableDir, 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(v1Ids.forall(_ % 10 == 3))
      // history carries the batch ids in commit order
      val hist = SnapTable.history(spark, tableDir)
        .orderBy("version").collect()
        .map(r => (r.getLong(0), r.getString(2))).toSeq
      assert(hist == Seq((1L, "batchId=0"), (2L, "batchId=1")))
    } finally {
      DedupIndex.detach(spark, idxDir)
      graft.operators.OpCaches.releaseAll()
    }
  }
}
