package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Throwaway stage profile for q28 at sf0.1 (run manually; not part of
  * the shipped contract — ignored unless -Dgraft.profile=1). */
class Q28ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.1"

  test("stage timings") {
    assume(sys.props.get("graft.profile").contains("1"))
    import graft.operators.BitmaskJaccard
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      info(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val toks = Tables(spark, sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct().cache()
    time("tokens distinct")(toks.count())
    val masks = BitmaskJaccard.masks(toks).cache()
    time("masks build")(masks.count())
    // replicate prefixPairs' internals piecewise
    val df = toks.groupBy("tok").agg(count(lit(1)).as("tdf"))
    val pref = toks.join(df, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nt"),
        sort_array(collect_list(struct(col("tdf"), col("tok")))).as("ord"))
      .select(col("doc_id"), col("nt"), posexplode(expr(
        "transform(slice(ord, 1, cast((2 * nt) div 10 + 1 AS INT)), o -> o.tok)"))
        .as(Seq("p0", "tok")))
      .select(col("doc_id"), col("nt"), (col("p0") + 1).as("pos"), col("tok"))
      .cache()
    time("prefix build")(pref.count())
    val L = pref.select(col("doc_id").as("a"), col("nt").as("na"),
      col("pos").as("pa"), col("tok"))
    val R = broadcast(pref.select(col("doc_id").as("b"), col("nt").as("nb"),
      col("pos").as("pb"), col("tok")))
    val cand = L.join(R, Seq("tok"))
      .filter(col("a") < col("b")
        && lit(8) * col("na") <= lit(10) * col("nb")
        && lit(8) * col("nb") <= lit(10) * col("na")
        && lit(18) * (lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")))
          >= lit(8) * (col("na") + col("nb")))
      .select("a", "b").distinct().cache()
    time("candidate join+distinct")(cand.count())
    val full = time("verify joins + popcount") {
      cand
        .join(masks.select(col("doc_id").as("a"), col("nt").as("na2"), col("m").as("ma")), Seq("a"))
        .join(masks.select(col("doc_id").as("b"), col("nt").as("nb2"), col("m").as("mb")), Seq("b"))
        .withColumn("inter", expr(BitmaskJaccard.interExpr))
        .filter(lit(10) * col("inter") >= lit(8) * (col("na2") + col("nb2") - col("inter")))
        .count()
    }
    info(s"verified pairs: $full, candidates: ${cand.count()}")
    spark.catalog.clearCache()
  }

  test("qc2 stage timings") {
    assume(sys.props.get("graft.profile").contains("1"))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      info(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = Tables(spark, sf, "documents").filter(col("doc_id") % 5 === 0)
    val (c1, _) = time("clean() pairwise build")(
      graft.operators.TrainingData.clean(docs))
    time("pairwise count")(c1.count())
    spark.catalog.clearCache()
    val (c2, _) = time("clean() cluster build (CC runs)")(
      graft.operators.TrainingData.clean(docs, clusterDedup = true))
    time("cluster count")(c2.count())
    spark.catalog.clearCache()
  }
}
