package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KV, TopKAgg}

/** S29 streaming weighted sample: the priority reservoir maintained as
  * documents arrive equals the batch qx13 top-k, across a checkpointed
  * restart — because the fixed-point priorities are deterministic and
  * top-k membership is batching-order-independent (TopKAgg's merge is
  * commutative/associative with a total (value DESC, key ASC) order).
  * State is the bounded k+1 buffer, never the corpus. */
class SampleStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed reservoir == batch sample across a checkpointed restart") {
    val s = spark
    import s.implicits._
    val expect = SparkEntry.queries("s29_streamsample")(s, TestSpark.Sf)
      .select("doc_id", "priority", "tau")
      .orderBy("doc_id").collect().toSeq
    assert(expect.size == 100)

    val docs = Tables(s, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("n_chars"))
    val half = col("doc_id") % 2 === 0
    val tmp = java.nio.file.Files.createTempDirectory("graft-s29").toString
    val (inDir, cp) = (s"$tmp/in", s"$tmp/cp")

    def runStream(): Seq[(Long, Long)] = {
      val raw = StructType(Seq(StructField("doc_id", LongType),
        StructField("n_chars", LongType)))
      val kv = s.readStream.schema(raw)
        .option("maxFilesPerTrigger", 1).parquet(inDir)
        .select(lpad(col("doc_id").cast("string"), 12, "0").as("key"),
          expr("(n_chars * 2147483648) div " +
            "((1103515245 * (doc_id % 2147483648) + 12345) % 2147483648 + 1)")
            .as("value"))
        .as[KV]
      val q = kv.groupByKey(_ => true)
        .agg(new TopKAgg(101).toColumn.name("top"))
        .writeStream.format("memory").queryName("s29_mem")
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("s29_mem").select(explode(col("top")).as("kv"))
        .select(col("kv.key").cast(LongType).as("doc_id"),
          col("kv.value").as("priority"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }

    docs.filter(half).coalesce(1).write.parquet(inDir)
    runStream()
    // RESTART with the second half staged: state restores from the
    // checkpoint, the reservoir keeps folding
    docs.filter(!half).coalesce(1).write.mode("append").parquet(inDir)
    val fin = runStream()
    assert(fin.size == 101)
    val ordered = fin.sortBy(e => (-e._2, e._1))
    val tau = ordered.last._2 // the (k+1)-th = threshold row
    val sample = ordered.init
    val got = sample.map(_._1).sorted
    val want = expect.map(_.getLong(0)).sorted
    assert(got == want, s"streamed membership diverged: ${got.size} vs ${want.size}")
    assert(tau == expect.head.getLong(2), "threshold must equal batch tau")
  }
}
