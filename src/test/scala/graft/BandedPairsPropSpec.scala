package graft

import graft.operators.BitmaskJaccard
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the first-matching-band LSH emission: on randomized
  * corpora, `bandedPairsCompact` (banded candidates joined at each
  * pair's FIRST matching band only — no distinct exchange) must produce
  * exactly the pairs an independent in-memory reimplementation of
  * "candidates = any shared band key, verify = exact Jaccard over
  * rolling-hash fingerprint sets" computes. Guards the inequality-
  * conjunct emission logic beyond the fixture corpus, across corpus
  * regimes where band collisions are common (tiny vocab) and rare
  * (wide vocab), plus duplicate-tolerance (raw multiset input ==
  * distinct input). */
class BandedPairsPropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val P = 1000000007L

  private def h(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % P)

  /** In-memory reference: MinHash(16) over fingerprint sets, 4 bands of
    * 4 concatenated minhashes, candidates = any shared (band, key),
    * verify den*inter >= num*(na+nb-inter). */
  private def expectedPairs(docs: Map[Long, Seq[String]], num: Int, den: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val per = docs.map { case (id, toks) =>
      val hs = toks.map(h).toSet
      val sig = (0 until 16).map { j =>
        val a = 1000003L * j + 12345L
        val b = 777767L * j + 13L
        hs.map(x => (a * x + b) % P).min
      }
      val keys = (0 until 4).map(b => sig.slice(4 * b, 4 * b + 4).mkString(","))
      (id, hs, keys)
    }.toSeq
    (for {
      (a, ha, ka) <- per; (b, hb, kb) <- per
      if a < b && ka.zip(kb).exists { case (x, y) => x == y }
      inter = (ha intersect hb).size.toLong
      na = ha.size.toLong; nb = hb.size.toLong
      if den * inter >= num * (na + nb - inter)
    } yield (a, b, inter, na, nb)).toSet
  }

  private def run(docs: Map[Long, Seq[String]], num: Int, den: Int,
                  dupFactor: Int): Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val rows = for {
      (id, toks) <- docs.toSeq; t <- toks; _ <- 1 to dupFactor
    } yield (id, t)
    val toksDf = rows.toDF("doc_id", "tok")
    BitmaskJaccard.bandedPairsCompact(toksDf, num, den)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
  }

  /** The FUSED bitmask form over distinct (doc_id, tok) rows — its
    * verify counts token sets, which equal the reference's fingerprint
    * sets here (short synthetic tokens; the rolling hash is collision-
    * free on them, asserted in expectedPairs' construction). */
  private def runFused(docs: Map[Long, Seq[String]], num: Int, den: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val rows = (for { (id, toks) <- docs.toSeq; t <- toks } yield (id, t)).distinct
    BitmaskJaccard.bandedPairsFused(rows.toDF("doc_id", "tok"), num, den)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
  }

  private def corpus(seed: Int, nDocs: Int, vocab: Int,
                     minLen: Int, maxLen: Int): Map[Long, Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    (0L until nDocs.toLong).map { id =>
      val len = minLen + rnd.nextInt(maxLen - minLen + 1)
      id -> Seq.fill(len)(s"w${rnd.nextInt(vocab)}")
    }.toMap
  }

  test("tiny uniform vocabulary (band collisions everywhere)") {
    val docs = corpus(seed = 7, nDocs = 60, vocab = 15, minLen = 5, maxLen = 18)
    val got = run(docs, 8, 10, dupFactor = 1)
    assert(got === expectedPairs(docs, 8, 10))
    assert(got.nonEmpty, "degenerate fixture: no qualifying pairs")
    assert(runFused(docs, 8, 10) === got, "fused bitmask form diverged")
    graft.operators.OpCaches.releaseAll()
  }

  test("wide vocabulary (collisions rare) at a looser threshold") {
    val docs = corpus(seed = 11, nDocs = 80, vocab = 400, minLen = 4, maxLen = 12)
    val got = run(docs, 5, 10, dupFactor = 1)
    assert(got === expectedPairs(docs, 5, 10))
    assert(runFused(docs, 5, 10) === got, "fused bitmask form diverged")
    graft.operators.OpCaches.releaseAll()
  }

  test("nBands == 1 degenerates to plain single-band candidates (no crash)") {
    // regression pin for the first-match predicate: with one band there
    // is no earlier band to exclude, so the conjunct list is empty —
    // this used to throw UnsupportedOperationException (empty.reduce).
    // Reference: candidates share the FULL 4-hash signature (one band
    // of 4 rows), verify = exact Jaccard over fingerprint sets.
    import spark.implicits._
    val docs = corpus(seed = 21, nDocs = 50, vocab = 12, minLen = 4, maxLen = 10)
    val toksDf = docs.toSeq.flatMap { case (id, ts) => ts.map((id, _)) }
      .toDF("doc_id", "tok")
    val got = BitmaskJaccard.bandedPairsCompact(toksDf, 5, 10, nHashes = 4, nBands = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val per = docs.map { case (id, toks) =>
      val hs = toks.map(h).toSet
      val sig = (0 until 4).map { j =>
        val a = 1000003L * j + 12345L
        val b = 777767L * j + 13L
        hs.map(x => (a * x + b) % P).min
      }
      (id, hs, sig.mkString(","))
    }.toSeq
    val expected = (for {
      (a, ha, ka) <- per; (b, hb, kb) <- per
      if a < b && ka == kb
      inter = (ha intersect hb).size.toLong
      na = ha.size.toLong; nb = hb.size.toLong
      if 10 * inter >= 5 * (na + nb - inter)
    } yield (a, b, inter, na, nb)).toSet
    assert(got === expected)
    assert(got.nonEmpty, "degenerate fixture: no qualifying pairs")
    graft.operators.OpCaches.releaseAll()
  }

  test("duplicate token rows do not change the result (multiset tolerance)") {
    val docs = corpus(seed = 13, nDocs = 40, vocab = 25, minLen = 5, maxLen = 15)
    assert(run(docs, 8, 10, dupFactor = 3) === expectedPairs(docs, 8, 10))
    graft.operators.OpCaches.releaseAll()
  }
}
