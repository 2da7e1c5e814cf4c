package graft

import graft.geo.{GeoQueries, SpacetimeEtl}
import graft.operators.{Relations, TrainingData}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clean: stages drop in order, output is dup-free at the thresholds") {
    val docs = Tables(spark, TestSpark.Sf, "documents")
    val (cleaned, statsF) = TrainingData.clean(docs)
    // ONE action materializes the result AND all four stage counters
    // (observe() metrics — clean itself runs no job)
    val outputRows = cleaned.count()
    val stats = statsF()
    assert(stats.input === docs.count())
    assert(stats.output === outputRows)
    assert(stats.input ===
      stats.lowQuality + stats.contaminated + stats.exactDups
        + stats.nearDups + stats.output)
    assert(stats.contaminated === 0, "no evalDocs given — nothing to decontaminate")
    // no exact duplicates survive
    assert(cleaned.groupBy("text").count().filter(col("count") > 1).count() === 0)
    // cleaned docs all meet the quality gate
    assert(cleaned.filter(size(split(col("text"), " ")) < 20).count() === 0)
    // banded (sub-quadratic) near-dedup can only MISS pairs vs the
    // all-pairs kernel — never invent them: exact-recall survivors are a
    // subset of banded survivors, and the recall loss is small
    val (cleanedExact, _) = TrainingData.clean(docs, exactRecall = true)
    assert(cleanedExact.select("doc_id").exceptAll(cleaned.select("doc_id")).count() === 0)
    val extraKept = cleaned.select("doc_id")
      .exceptAll(cleanedExact.select("doc_id")).count()
    val exactKept = cleanedExact.count()
    assert(extraKept <= (outputRows - exactKept).max(0L))
    assert(extraKept * 20 <= stats.input, s"banded recall loss too high: $extraKept docs")
    // the two banded verify kernels (bitmask vs dictionary-free sorted
    // sets) keep exactly the same documents
    val (cleanedDF, _) = TrainingData.clean(docs, dictionaryFree = true)
    assert(cleanedDF.select("doc_id").exceptAll(cleaned.select("doc_id")).count() === 0)
    assert(cleaned.select("doc_id").exceptAll(cleanedDF.select("doc_id")).count() === 0)
    info(s"clean stats: $stats")
    // cluster-based dedup keeps exactly one doc per near-dup component:
    // survivors are a subset of the pairwise policy's (any pair b-side
    // is a non-min member of its component), and every kept doc is its
    // component's min
    val (cleanedCl, _) = TrainingData.clean(docs, clusterDedup = true)
    assert(cleanedCl.select("doc_id").exceptAll(cleaned.select("doc_id")).count() === 0)
    assert(cleanedCl.count() > 0)
    // clean()'s documented caching contract: callers running several
    // independent invocations release the handles themselves
    graft.operators.OpCaches.releaseAll(blocking = true)
  }

  test("clean with evalDocs removes exactly the shingle-sharing survivors") {
    import graft.operators.TrainingData
    val docs = Tables(spark, TestSpark.Sf, "documents")
    val ev = docs.filter(col("doc_id") % 97 === 0)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    // decontShingle = 3 matches qx1's audit setting so the cross-check
    // against the independent qx1 contaminated set below is exact
    val (cleaned, statsF) = TrainingData.clean(train, evalDocs = Some(ev),
      decontShingle = 3)
    val out = cleaned.select("doc_id").collect().map(_.getLong(0)).toSet
    val stats = statsF()
    assert(stats.contaminated > 0, "fixture should contain contaminated docs")
    assert(stats.input === stats.lowQuality + stats.contaminated
      + stats.exactDups + stats.nearDups + stats.output)
    // no survivor shares a 3-token shingle with the eval set (qx1's
    // independent query computes the contaminated doc set over the FULL
    // corpus; restrict to quality-gated train docs)
    val contaminated = SparkEntry.queries("qx1_decontam")(spark, TestSpark.Sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.intersect(contaminated).isEmpty,
      "decontaminated output still contains eval-overlapping docs")
    graft.operators.OpCaches.releaseAll(blocking = true)
  }

  test("clean() caches are fully released by OpCaches.releaseAll") {
    // start from a clean slate: other suites share the session
    spark.catalog.clearCache()
    val docs = Tables(spark, TestSpark.Sf, "documents")
    val (cleaned, _) = TrainingData.clean(docs)
    cleaned.count() // materialize (and populate the operator caches)
    assert(!spark.sharedState.cacheManager.isEmpty,
      "clean() + action should have populated operator caches")
    graft.operators.OpCaches.releaseAll(blocking = true)
    assert(spark.sharedState.cacheManager.isEmpty,
      "operator caches leaked past OpCaches.releaseAll()")
  }

  test("relations degrees/neighbors over the pipeline's edge output") {
    val inferred = SpacetimeEtl.infer(spark,
      SpacetimeEtl.readStreets(spark, s"${GeoQueries.FixtureDir}/streets.ndjson"),
      SpacetimeEtl.readHouseNumbers(spark, s"${GeoQueries.FixtureDir}/house_numbers.ndjson"))
    val matched = inferred.where(col("streetId").isNotNull)
    val edges = matched.select(col("houseNumberId").as("from"),
        col("streetId").as("to"), lit("st:in").as("type"))
      .union(matched.select(col("id").as("from"),
        col("houseNumberId").as("to"), lit("st:sameAs").as("type")))
    val deg = Relations.degrees(edges)
    // every house number has out-degree 1 (st:in) and in-degree 1 (sameAs)
    val hn = deg.filter(col("node").startsWith("building-inspector/"))
    assert(hn.filter(col("out_deg") =!= 1 || col("in_deg") =!= 1).count() === 0)
    // a street's neighbors via st:in are house numbers
    val street = matched.select("streetId").first().getString(0)
    val nb = Relations.neighbors(edges, street, "st:in")
    assert(nb.count() > 0)
    assert(nb.collect().forall(_.getString(0).startsWith("building-inspector/")))
  }

  test("removeDupSpans: shared 8-token spans are scrubbed, short docs untouched") {
    import spark.implicits._
    // docs 1 and 2 share the 8-token span s1..s8 (plus their own unique
    // tails); doc 3 is shorter than the window; doc 4 IS exactly the
    // shared span, so every token is removed and the stitch is empty
    val shared = (1 to 8).map("s" + _).mkString(" ")
    val docs = Seq(
      (1L, shared + " u1 u2 u3 u4 u5 u6 u7 u8"),
      (2L, "v1 v2 v3 v4 v5 v6 v7 v8 " + shared),
      (3L, "tiny doc"),
      (4L, shared)
    ).toDF("doc_id", "text")
    val out = TrainingData.removeDupSpans(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: the shared span's 8 tokens removed, unique tail survives
    assert(out(0) === ((1L, 16L, 8L, "u1 u2 u3 u4 u5 u6 u7 u8")))
    // doc 2: prefix survives
    assert(out(1) === ((2L, 16L, 8L, "v1 v2 v3 v4 v5 v6 v7 v8")))
    // doc 3: below the window, untouched
    assert(out(2) === ((3L, 2L, 2L, "tiny doc")))
    // doc 4: fully removed, empty stitch
    assert(out(3) === ((4L, 8L, 0L, "")))
    graft.operators.OpCaches.releaseAll()
  }
}
