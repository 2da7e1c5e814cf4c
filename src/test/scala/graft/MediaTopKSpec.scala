package graft

import graft.functions.{KV, TopKAgg}
import graft.multimodal.Media
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MediaTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("media features: deterministic, batch-shaped, payloads stay opaque") {
    val ds = Media.synthetic(spark, 100).repartition(4)
    val f = Media.features(ds, thumbLen = 16).collect().sortBy(_.id)
    assert(f.length === 100)
    assert(f.forall(_.thumb.length === 16))
    assert(f.forall(x => x.meanByte >= 0 && x.meanByte < 256))
    assert(f.forall(x => x.thumb.forall(p => p >= 0f && p < 1f)))
    // determinism across runs and partitionings
    val f2 = Media.features(ds.repartition(7), thumbLen = 16).collect().sortBy(_.id)
    assert(f.map(_.meanByte).toSeq === f2.map(_.meanByte).toSeq)
    assert(f.zip(f2).forall { case (a, b) => a.thumb.sameElements(b.thumb) })
    // kinds alternate per the synthetic generator
    assert(f.count(_.kind == "image") === 50 && f.count(_.kind == "audio") === 50)
  }

  test("TopKAgg: exact top-k with deterministic tie-break, O(k) buffer") {
    import spark.implicits._
    val data = Seq(KV("a", 5), KV("b", 9), KV("c", 9), KV("d", 1),
      KV("e", 7), KV("f", 7), KV("g", 3)).toDS().repartition(3)
    val top3 = data.select(udaf(new TopKAgg(3)).apply(col("key"), col("value")))
      .as[Seq[KV]].collect()(0)
    assert(top3 === Seq(KV("b", 9), KV("c", 9), KV("e", 7)))
  }
}
