package graft

import graft.operators.SnapTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force replays for the round-11 additions (the Round10OpsSpec
  * convention: every new oracle query also gets a driver-side replay in
  * plain Scala, so a bug shared by the Spark plan and the DuckDB SQL
  * cannot hide behind their agreement). */
class Round11OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("qt29 URL canonicalization matches a character-level replay") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def canon(docId: Long, source: String): (String, String) = {
      val url = s"HTTPS://WWW.${source.toUpperCase}.Example.COM:443" +
        s"/docs//${docId % 4}/?utm_campaign=c${docId % 3}" +
        s"&ref=feed&id=${docId % 2}&b=2&a=1#sec${docId % 5}"
      val nf = url.replaceAll("#.*$", "")
      val scheme = "^([A-Za-z]+)://".r.findFirstMatchIn(nf).get.group(1)
        .toLowerCase
      val hp = "^[A-Za-z]+://([^/?]+)".r.findFirstMatchIn(nf).get.group(1)
        .toLowerCase
      val rest = nf.replaceFirst("^[A-Za-z]+://[^/?]*", "")
      val host0 = hp.replaceFirst("^www\\.", "")
      val host =
        if (scheme == "https") host0.replaceFirst(":443$", "")
        else if (scheme == "http") host0.replaceFirst(":80$", "")
        else host0
      val path0 = rest.takeWhile(_ != '?').replaceAll("/{2,}", "/")
      val path = if (path0.isEmpty) "/" else path0
      val qs = if (rest.contains('?')) rest.dropWhile(_ != '?').tail else ""
      val params = qs.split("&").filter(p => p.nonEmpty &&
        !p.startsWith("utm_") && !p.startsWith("ref=")).sorted.mkString("&")
      (host, s"$scheme://$host$path" +
        (if (params.isEmpty) "" else s"?$params"))
    }
    val want = rows.map { case (id, src) => canon(id, src) }
      .groupBy(_._1).map { case (dom, cs) =>
        val canons = cs.map(_._2)
        (dom, canons.length.toLong, canons.distinct.length.toLong,
          (canons.length - canons.distinct.length).toLong, canons.min)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("qt29_urlnorm")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    // every rule must be non-vacuous on the fixture
    assert(want.forall(_._5.startsWith("https://")),
      "scheme/host lowercasing or port strip vacuous")
    assert(want.forall(!_._5.contains("www.")), "www strip vacuous")
    assert(want.forall(!_._5.contains("//docs")), "slash collapse vacuous")
    assert(want.forall(!_._5.contains("utm_")), "tracking strip vacuous")
    assert(want.forall(w => !w._5.contains("#")), "fragment strip vacuous")
    assert(want.exists(_._4 > 0),
      "no duplicate canonical URLs — the dedup-headroom column is vacuous")
    assert(got === want)
  }

  test("q156 metadata table matches the manifest and ground truth") {
    val got = SparkEntry.queries("q156_snapmeta")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val li = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0))
    val even = li.filter(_ % 2 == 0)
    val want = Seq(
      (1L, 8L, 8L, 8L, even.min, even.max),
      (2L, 12L, 12L, 12L, li.min, li.max))
    assert(got === want)

    // the per-file relation itself: ranges cover, blooms everywhere,
    // v1's 8 lines carry VERBATIM into v2's manifest
    val dir = "target/graft-snapmeta/" +
      TestSpark.Sf.replaceAll("[^A-Za-z0-9]", "_")
    val m1 = SnapTable.filesMeta(spark, dir, 1)
      .collect().map(r => (r.getString(0),
        r.getLong(r.fieldIndex("min_l_orderkey")),
        r.getLong(r.fieldIndex("max_l_orderkey")),
        r.getBoolean(r.fieldIndex("has_bloom"))))
    assert(m1.length == 8 && m1.forall(_._4))
    assert(m1.forall(f => f._2 <= f._3))
    val m2 = SnapTable.filesMeta(spark, dir, 2)
      .collect().map(_.getString(0)).toSet
    assert(m1.map(_._1).toSet.subsetOf(m2) && m2.size == 12,
      "v2 metadata must carry v1's files verbatim plus 4 new")
  }
}
