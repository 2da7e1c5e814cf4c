package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side brute-force oracles for the round-10 additions (and the
  * two round-9 queries the r9 verdict flagged as missing them): qd21's
  * cross-source duplicate flow matrix, qt27's quality-pruning threshold
  * curve, qd22's ExactSubstr maximal spans — each recomputed from the
  * raw sf0.001 parquet with plain Scala collections, independent of the
  * DataFrame formulations (explicit loops and sets here vs bitmask
  * kernels / window functions there). */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val P = 1000000007L

  /** The repo-wide cross-engine rolling hash: fold acc*31 + codepoint
    * mod 1e9+7 over the string's codepoints. */
  private def rollHash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def docs(): Array[(Long, String, String)] =
    spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("qd22 ExactSubstr spans match a driver-side brute force") {
    val L = 8
    val ds = docs().map(d => (d._1, d._2.split(" ")))
    // global window occurrence counts
    val occ = scala.collection.mutable.Map.empty[Long, Int]
    for ((_, tk) <- ds if tk.length >= L;
         k <- 0 to tk.length - L) {
      val h = rollHash(tk.slice(k, k + L).mkString(" "))
      occ(h) = occ.getOrElse(h, 0) + 1
    }
    // per doc: duplicated-window starts -> merged maximal islands
    val want = ds.toSeq.flatMap { case (id, tk) =>
      val dups = (0 to tk.length - L).filter { k =>
        tk.length >= L && occ(rollHash(tk.slice(k, k + L).mkString(" "))) >= 2
      }
      // islands: split where the next start exceeds prev + L
      val islands = dups.foldLeft(List.empty[List[Int]]) {
        case (acc, k) if acc.nonEmpty && k <= acc.head.head + L =>
          (k :: acc.head) :: acc.tail
        case (acc, k) => List(k) :: acc
      }.reverse.map(_.reverse)
      islands.zipWithIndex.map { case (ks, i) =>
        val start = ks.min + 1 // 1-based token index, matching the query
        val end = ks.max + L   // ks.max is 0-based; end = max + L - 1 + 1
        (id, (i + 1).toLong, start.toLong, end.toLong,
          (end - start + 1).toLong,
          rollHash(tk.slice(start - 1, end).mkString(" ")))
      }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("qd22_exactsubstr")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(got.nonEmpty, "fixture produced no spans — gate is vacuous")
    assert(got === want)
  }

  test("qd21 duplicate-flow matrix matches a brute-force MinHash-LSH replay") {
    val ds = docs()
    val tokSets = ds.map(d => (d._1, d._2.split(" ").toSet)).toMap
    val srcs = ds.map(d => (d._1, d._3)).toMap
    // 16 minhashes over the distinct-token rolling hashes
    val sigs = tokSets.map { case (id, ts) =>
      val hs = ts.map(rollHash)
      id -> (0 until 16).map { j =>
        val a = 1000003L * j + 12345L
        val b = 777767L * j + 13L
        hs.map(h => (a * h + b) % P).min
      }
    }
    val ids = ds.map(_._1).sorted
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      // candidate: some 4-row band agrees
      if (0 until 4).exists(bd =>
        (0 until 4).forall(r => sigs(a)(4 * bd + r) == sigs(b)(4 * bd + r)))
      // verify: exact Jaccard >= 8/10 in the single-occurrence int form
      inter = (tokSets(a) & tokSets(b)).size.toLong
      if 18L * inter >= 8L * (tokSets(a).size + tokSets(b).size)
    } yield (a, b)
    val flows = pairs.groupBy { case (a, b) =>
      val (sa, sb) = (srcs(a), srcs(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSeq
    val tot = flows.map(_._3).sum
    val want = flows.map { case (s1, s2, n) =>
      (s1, s2, n, if (s1 != s2) 1L else 0L, r6(n.toDouble * 100.0 / tot))
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("qd21_dupflow")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(got.nonEmpty && tot > 0L, "no duplicate pairs — gate is vacuous")
    assert(got === want)
  }

  test("t6 theta sketch algebra matches a brute-force KMV replay; partition-invariant") {
    import org.apache.spark.sql.functions._
    val BIG = 1000000007L
    val rows = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_returnflag", "l_partkey", "l_suppkey").collect()
      .map(r => (r.getString(0),
        (1103515245L * (r.getLong(1) * 100000L + r.getLong(2)) + 12345L) % BIG))
    val sets = rows.groupBy(_._1).map { case (s, g) => s -> g.map(_._2).toSet }
    val K = 256
    def bottomK(s: Set[Long]): Vector[Long] = s.toVector.sorted.take(K)
    val srcs = sets.keys.toSeq.sorted
    val want = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      (s1, s2) = (srcs(i), srcs(j))
      (sa, sb) = (sets(s1), sets(s2))
      (ba, bb) = (bottomK(sa), bottomK(sb))
      u = (ba ++ bb).distinct.sorted.take(K)
      nBk = u.length.toLong
      vk = u.last
      ji = u.count(v => ba.contains(v) && bb.contains(v)).toLong
      nInter = (sa & sb).size.toLong
    } yield {
      def rr(v: Double) = r6(v)
      val estU = if (nBk < K) nBk.toDouble else 255.0 * BIG / vk
      val estI = if (nBk < K) ji.toDouble
        else (ji * 255L * BIG).toDouble / vk / 256.0
      (s1, s2, sa.size.toLong, sb.size.toLong, nInter,
        sa.size + sb.size - nInter, nBk, vk, ji,
        rr(estU), rr(estI), rr(ji.toDouble / nBk))
    }).sortBy(t => (t._1, t._2))
    def run() = SparkEntry.queries("t6_theta")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getDouble(9), r.getDouble(10), r.getDouble(11))).toSeq
    val got = run()
    graft.operators.OpCaches.releaseAll()
    assert(got === want)
    assert(got.exists(_._7 === 256L),
      "no sketch trimmed at sf0.001 — the estimator path is vacuous")
    // the native aggregate must be partition-invariant (merge is a
    // pure set function): same result under a different partitioning
    graft.plans.BottomK256.register(spark)
    val el = Tables(spark, TestSpark.Sf, "lineitem")
      .select(col("l_returnflag").as("src"),
        ((lit(1103515245L) * (col("l_partkey") * 100000L + col("l_suppkey"))
          + 12345L) % BIG).as("h"))
    val a = el.repartition(13).groupBy("src")
      .agg(expr("bottom_k256(h)").as("bk")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val b = el.repartition(1).groupBy("src")
      .agg(expr("bottom_k256(h)").as("bk")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
    assert(a.values.forall(v => v == v.sorted && v.distinct == v))
  }

  test("qm10 aHash near-dup matches a brute-force pixel replay") {
    // signatures recomputed from the pixel formula WITHOUT the BMP
    // round trip (the independence the gate needs: query-side hashes
    // come from decoded bytes, these from arithmetic)
    def sig(id: Long): Array[Long] = {
      val base = id - id % 10
      val bigh = (base * 2654435761L) / 1024
      val c1 = (bigh % 8).toInt
      val c2 = 1 + ((bigh / 8) % 7).toInt
      val c3 = 1 + ((bigh / 64) % 7).toInt
      val w = 16 + ((base / 10) % 7).toInt
      val h = 8 + ((base / 10) % 5).toInt
      val bs = new Array[Long](64); val np = new Array[Long](64)
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val bx = x * 8 / w; val by = y * 8 / h
        val lvl = (c1 + c2 * bx + c3 * by + bx * by) % 8
        val lum = 3 * lvl * 32 + ((7L * x + 13L * y + id) % 32) +
          ((3L * x + 5L * y + id) % 16) + ((x.toLong * y + id) % 16)
        bs(by * 8 + bx) += lum; np(by * 8 + bx) += 1; total += lum
      }
      val n = w.toLong * h
      val ks = new Array[Long](4)
      for (i <- 0 until 64 if bs(i) * n >= total * np(i))
        ks(i / 16) |= 1L << (i % 16)
      ks
    }
    val ids = docs().map(_._1).filter(_ % 5 == 0).sorted
    val sigs = ids.map(id => id -> sig(id)).toMap
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if (0 until 4).exists(k => sigs(a)(k) == sigs(b)(k))
      hd = (0 until 4).map(k =>
        java.lang.Long.bitCount(sigs(a)(k) ^ sigs(b)(k))).sum.toLong
      if hd <= 6
    } yield (a, b, hd)).sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("qm10_ahashdup")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(got.nonEmpty, "no near-dup pairs — gate is vacuous")
    assert(got === want)
  }

  test("t7 rollup: KMV mergeability holds per group and the trim is non-vacuous") {
    val got = SparkEntry.queries("t7_thetarollup")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    graft.operators.OpCaches.releaseAll()
    assert(got.nonEmpty)
    // merged == direct must hold for EVERY group — mergeability is the
    // operator's contract, asserted as data
    assert(got.forall(_._5 === 1L), s"rollup diverged from direct: $got")
    // the union-and-trim path must actually trim (groups larger than k)
    assert(got.exists(r => r._3 === 256L && r._6 > 256L),
      "no group exceeded k — the merge path is vacuous")
    // KMV estimate sanity: within 25% of exact at k=256 (the estimator
    // has ~1/sqrt(k) ≈ 6% std error; 25% is a 4-sigma guard, not a
    // tolerance gate — exactness is the oracle's job)
    assert(got.filter(_._3 === 256L).forall(r =>
      math.abs(r._7 - r._6) <= 0.25 * r._6), s"estimate off: $got")
  }

  test("qm11 audio fingerprint near-dup matches a brute-force sample replay") {
    // fingerprints from the sample ARITHMETIC, no WAV round trip (the
    // independence the gate needs)
    def sig(id: Long): Array[Long] = {
      val base = id - id % 14
      val n = 528
      val s = Array.tabulate(n) { i =>
        val blk = i / 16
        val amp = 1 + (((base + 1) * (blk + 3) * 2654435761L / 1024) % 8)
        val tone = (i * 1231L + base * 37L) % 256 - 128
        amp * tone + (id % 14) * (i % 2)
      }
      val nf = (n - 16) / 8 + 1
      val e = Array.tabulate(nf)(f =>
        (0 until 16).map(j => s(f * 8 + j) * s(f * 8 + j)).sum)
      val ks = new Array[Long](4)
      for (f <- 0 until nf - 1 if e(f + 1) > e(f))
        ks(f / 16) |= 1L << (f % 16)
      ks
    }
    val ids = docs().map(_._1).filter(_ % 7 == 0).sorted
    val sigs = ids.map(id => id -> sig(id)).toMap
    val want = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if (0 until 4).exists(k => sigs(a)(k) == sigs(b)(k))
      hd = (0 until 4).map(k =>
        java.lang.Long.bitCount(sigs(a)(k) ^ sigs(b)(k))).sum.toLong
      if hd <= 6
    } yield (a, b, hd)).sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("qm11_audiodup")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(got.nonEmpty, "no near-dup pairs — gate is vacuous")
    assert(got === want)
  }

  test("qt27 pruning curve matches a brute-force bigram-LM replay") {
    val ds = docs().map(d => (d._1, d._2.split(" ")))
    val bigrams = ds.flatMap { case (id, tk) =>
      if (tk.length < 2) Seq.empty
      else (1 until tk.length).map(k => (id, tk(k - 1), tk(k)))
    }
    val c1 = bigrams.groupBy(_._2).map { case (w, g) => w -> g.length.toLong }
    val c12 = bigrams.groupBy(b => (b._2, b._3))
      .map { case (k, g) => k -> g.length.toLong }
    // p rounded to the declared 1e-8 decimal grid, summed EXACTLY
    val p = c12.map { case ((w1, w2), c) =>
      (w1, w2) -> BigDecimal(c).bigDecimal
        .divide(java.math.BigDecimal.valueOf(c1(w1)), 8,
          java.math.RoundingMode.HALF_UP)
    }
    val scores = ds.flatMap { case (id, tk) =>
      if (tk.length < 2) None
      else {
        val ps = (1 until tk.length).map(k => p((tk(k - 1), tk(k))))
        val sp = ps.map(BigDecimal(_)).sum
        Some(id -> r6(sp.toDouble / ps.length))
      }
    }.toMap
    val nTok = ds.map { case (id, tk) => id -> tk.length.toLong }.toMap
    val taus = Seq(0.030, 0.031, 0.032, 0.033, 0.034, 0.035, 0.036, 0.037)
    val want = taus.map { tau =>
      val all = scores.keys.toSeq
      val kept = all.filter(id => scores(id) >= tau)
      val nt = all.map(nTok).sum
      val kt = kept.map(nTok).sum
      (tau, all.size.toLong, kept.size.toLong, nt, kt,
        r6(kept.size.toDouble * 100.0 / all.size),
        r6(kt.toDouble * 100.0 / nt))
    }
    val got = SparkEntry.queries("qt27_prunecurve")(spark, TestSpark.Sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(got.map(_._3).exists(k => k > 0 && k < got.head._2),
      "curve never moves — gate is vacuous")
    assert(got === want)
  }

  test("qd23 OPH pairs match a brute-force bin/densify/band replay") {
    val ds = docs().map { case (id, text, _) =>
      val tk = text.split(" ")
      val hs = (if (tk.length >= 4)
        (0 to tk.length - 4).map(k => rollHash(tk.slice(k, k + 4).mkString(" ")))
      else Seq.empty[Long]).distinct.sorted
      (id, hs)
    }.filter(_._2.nonEmpty)
    // OPH: 16 bins, slot = min(h div 16 : h % 16 = i), densify rightward
    def sig(hs: Seq[Long]): Array[Long] = {
      val bins = Array.fill[Option[Long]](16)(None)
      hs.foreach { h =>
        val b = (h % 16).toInt
        val v = h / 16
        if (bins(b).forall(_ > v)) bins(b) = Some(v)
      }
      Array.tabulate(16) { i =>
        val j = (0 until 16).find(j => bins((i + j) % 16).isDefined).get
        bins((i + j) % 16).get + j.toLong * 1000000000L
      }
    }
    def keys(ds16: Array[Long]): Array[Long] =
      Array.tabulate(4) { k =>
        (0 until 4).foldLeft(0L)((acc, x) => (acc * 31 + ds16(k * 4 + x)) % P)
      }
    val withKeys = ds.map { case (id, hs) => (id, hs.toSet, keys(sig(hs))) }
    val want = (for {
      (a, ha, ka) <- withKeys; (b, hb, kb) <- withKeys if a < b
      // first matching band only (pair-unique emission)
      k <- (0 until 4).find(k => ka(k) == kb(k)).toSeq
      inter = (ha intersect hb).size.toLong
      if 3 * inter >= ha.size + hb.size
    } yield (a, b, ha.size.toLong, hb.size.toLong, inter)).sortBy(p => (p._1, p._2))
    val got = SparkEntry.queries("qd23_oph")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(want.nonEmpty, "no OPH pairs at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  test("qt28 RAKE top-3 phrases match a brute-force per-doc replay") {
    val stop = Set("the", "a", "of", "and")
    val want = docs().toSeq.flatMap { case (id, text, _) =>
      val tk = text.split(" ", -1)
      // phrase id = running stopword count; keep non-stop non-empty
      var pid = 0L
      val occ = tk.toSeq.map { w =>
        if (stop(w)) { pid += 1; (pid, w, true) } else (pid, w, false)
      }.filter(o => !o._3 && o._2.nonEmpty).map(o => (o._1, o._2))
      if (occ.isEmpty) Seq.empty
      else {
        val plen = occ.groupBy(_._1).map { case (p, os) => p -> os.size.toLong }
        val deg = occ.groupBy(_._2).map { case (w, os) =>
          w -> os.map(o => plen(o._1)).sum
        }
        val phrases = occ.groupBy(_._1).toSeq.map { case (p, os) =>
          (os.map(_._2).mkString(" "), os.size.toLong, os.map(o => deg(o._2)).sum)
        }
        phrases.sortBy(ph => (-ph._3, ph._1)).take(3).zipWithIndex.map {
          case ((phrase, nw, score), i) => (id, i + 1L, phrase, nw, score)
        }
      }
    }.sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("qt28_rake")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(want.nonEmpty && want.exists(_._4 > 1),
      "no multi-word phrase at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  /** events → the shared (event_type, day, x) daily relation (cents sum
    * div 1000) the q108/q134/q141 correlation family aggregates over. */
  private def daily(): Map[(String, Long), Long] = {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "ts", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map { r =>
        // events.ts is TIMESTAMP_NTZ (LocalDateTime in Row); the engine
        // runs with session timeZone UTC, so unix_micros reads it as UTC
        val ldt = r.getAs[java.time.LocalDateTime](1)
        val us = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
        (r.getString(0), Math.floorDiv(us, 86400000000L),
          math.floor(r.getDouble(2) * 100).toLong)
      }
    rows.groupBy(t => (t._1, t._2))
      .map { case (k, vs) => k -> vs.map(_._3).sum / 1000L }
  }

  test("q141 Spearman matches a brute-force doubled-rank replay") {
    val dl = daily()
    val types = dl.keySet.map(_._1).toSeq.sorted
    def r2s(xs: Seq[Long]): Seq[Long] =
      xs.map(x => 2L * xs.count(_ < x) + xs.count(_ == x) + 1L)
    val want = (for {
      i <- types.indices; j <- (i + 1) until types.length
      ta = types(i); tb = types(j)
      days = dl.keySet.filter(_._1 == ta).map(_._2)
        .intersect(dl.keySet.filter(_._1 == tb).map(_._2)).toSeq.sorted
      if days.nonEmpty
    } yield {
      val xa = days.map(dy => dl((ta, dy)))
      val xb = days.map(dy => dl((tb, dy)))
      val (rx, ry) = (r2s(xa), r2s(xb))
      val n = days.length.toLong
      val (sx, sy) = (rx.sum, ry.sum)
      val sxy = rx.zip(ry).map { case (u, v) => u * v }.sum
      val sxx = rx.map(u => u * u).sum
      val syy = ry.map(u => u * u).sum
      val num = n * sxy - sx * sy
      val (denx, deny) = (n * sxx - sx * sx, n * syy - sy * sy)
      val rho =
        if (denx == 0L || deny == 0L) None
        else Some(r6(num.toDouble
          / (math.sqrt(denx.toDouble) * math.sqrt(deny.toDouble))))
      (ta, tb, n, num, denx, deny, rho)
    }).sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q141_spearman")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toSeq
    assert(want.nonEmpty && want.exists(_._7.isDefined),
      "no pair with non-degenerate ranks at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  test("q142 Cliff's delta matches a brute-force all-pairs replay") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "user_id", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100).toLong))
    val want = rows.groupBy(_._1).toSeq.map { case (ty, rs) =>
      val byUser = rs.groupBy(_._2)
        .map { case (u, vs) => (u, vs.map(_._3).sum / 1000L) }
      val a0 = byUser.collect {
        case (u, v) if ((u % 2) + 2) % 2 == 0 => v }.toSeq
      val a1 = byUser.collect {
        case (u, v) if ((u % 2) + 2) % 2 == 1 => v }.toSeq
      // all-pairs dominance counts — the histogram-window formulation's
      // definitional form (quadratic here, fine at sf0.001)
      val gt = a0.map(x => a1.count(_ < x).toLong).sum
      val lt = a0.map(x => a1.count(_ > x).toLong).sum
      val (n0, n1) = (a0.length.toLong, a1.length.toLong)
      val num = gt - lt
      val delta =
        if (n0 * n1 == 0L) None else Some(r6(num.toDouble / (n0 * n1)))
      val mag =
        if (n0 * n1 == 0L) "undefined"
        else if (1000L * math.abs(num) < 147L * n0 * n1) "negligible"
        else if (1000L * math.abs(num) < 330L * n0 * n1) "small"
        else if (1000L * math.abs(num) < 474L * n0 * n1) "medium"
        else "large"
      (ty, n0, n1, gt, lt, num, delta, mag)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q142_cliffs")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        r.getString(7))).toSeq
    assert(want.nonEmpty && want.exists(t => t._4 + t._5 > 0),
      "no cross-arm comparisons at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  test("q143 Wilcoxon matches a brute-force signed-rank replay") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "user_id", "ts", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3))
      .map { r =>
        val ldt = r.getAs[java.time.LocalDateTime](2)
        val us = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
        (r.getString(0), r.getLong(1),
          Math.floorDiv(us, 86400000000L) % 2L,
          math.floor(r.getDouble(3) * 100).toLong)
      }
    val want = rows.groupBy(_._1).toSeq.map { case (ty, rs) =>
      val ds = rs.groupBy(_._2).toSeq.map { case (_, es) =>
        val x = es.filter(_._3 == 0L).map(_._4).sum
        val y = es.filter(_._3 == 1L).map(_._4).sum
        (x - y) / 1000L // Scala / truncates toward zero like div
      }.filter(_ != 0L)
      val as = ds.map(math.abs)
      val n = ds.length.toLong
      // doubled average rank of |d|, summed over positive d
      val w2p = ds.filter(_ > 0L).map { dd =>
        val a = math.abs(dd)
        2L * as.count(_ < a) + as.count(_ == a) + 1L
      }.sum
      val ts3 = as.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * t * t - t }).sum
      val variance = n * (n + 1L) * (2L * n + 1L) / 24.0 - ts3 / 48.0
      val z =
        if (variance <= 0.0) None
        else Some(r6((w2p - n * (n + 1L) / 2L).toDouble
          / (2.0 * math.sqrt(variance))))
      (ty, n, w2p, ts3, z)
    }.filter(_._2 > 0L).sortBy(_._1)
    val got = SparkEntry.queries("q143_wilcoxon")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(want.nonEmpty && want.exists(_._3 > 0L),
      "no positive differences at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  test("qs17 hard negatives match a brute-force hyperplane/band replay") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(v =>
          math.floor(v.toDouble * 1e7).toLong)))
    // 64 hyperplane signs -> 4 x 16-bit band keys (the qd4/qs1 sketch)
    def bandKeys(x: Array[Long]): Array[Long] = {
      val keys = new Array[Long](4)
      for (j <- 0 until 64) {
        var p = 0L
        for (i <- x.indices) {
          val c = (1103515245L * (64L * j + i) + 12345L) % 2147483648L -
            1073741824L
          p += c * x(i)
        }
        if (p > 0) keys(j / 16) |= 1L << (j % 16)
      }
      keys
    }
    val sk = vecs.map { case (id, x) => (id, x, bandKeys(x)) }
    val probes = sk.filter(_._1 % 100 == 7)
    val want = probes.toSeq.flatMap { case (q, qe, qk) =>
      val qn2 = qe.map(v => v * v).sum
      val cands = sk.filter { case (id, _, k) =>
        id != q && k.indices.exists(b => k(b) == qk(b))
      }
      val hard = cands.flatMap { case (id, x, _) =>
        val dot = x.zip(qe).map { case (u, v) => u * v }.sum
        val n2 = x.map(v => v * v).sum
        val d2 = BigInt(dot) * BigInt(dot)
        val nn = BigInt(n2) * BigInt(qn2)
        if (dot > 0 && d2 * 400 >= nn && d2 * 25 < nn * 4)
          Some((id, r6(dot.toDouble
            / (math.sqrt(qn2.toDouble) * math.sqrt(n2.toDouble)))))
        else None
      }
      hard.sortBy { case (id, sc) => (-sc, id) }.take(3).zipWithIndex
        .map { case ((id, sc), i) => (q, id, sc, i + 1L) }
    }.sortBy(t => (t._1, t._4))
    val got = SparkEntry.queries("qs17_hardneg")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(want.nonEmpty, "no hard negatives at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  test("q144 Welch t/df match a brute-force replay over the exact sums") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "user_id", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100).toLong))
    val want = rows.groupBy(_._1).toSeq.map { case (ty, rs) =>
      val vs = rs.groupBy(_._2).toSeq.map { case (u, es) =>
        (((u % 2) + 2) % 2, es.map(_._3).sum / 1000L)
      }
      val a0 = vs.filter(_._1 == 0L).map(_._2)
      val a1 = vs.filter(_._1 == 1L).map(_._2)
      val (n0, s0, q0) = (a0.length.toLong, a0.sum, a0.map(v => v * v).sum)
      val (n1, s1, q1) = (a1.length.toLong, a1.sum, a1.map(v => v * v).sum)
      val se0 = (q0.toDouble - s0.toDouble * s0 / n0) / (n0 - 1L) / n0
      val se1 = (q1.toDouble - s1.toDouble * s1 / n1) / (n1 - 1L) / n1
      val ok = n0 >= 2L && n1 >= 2L && se0 + se1 > 0.0
      val tstat = if (!ok) None
        else Some(r6((s0.toDouble / n0 - s1.toDouble / n1)
          / math.sqrt(se0 + se1)))
      val df = if (!ok) None
        else Some(r6((se0 + se1) * (se0 + se1)
          / (se0 * se0 / (n0 - 1L) + se1 * se1 / (n1 - 1L))))
      (ty, n0, s0, q0, n1, s1, q1, tstat, df)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q144_welch")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7)),
        if (r.isNullAt(8)) None else Some(r.getDouble(8)))).toSeq
    assert(want.nonEmpty && want.exists(_._8.isDefined),
      "no computable t at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  test("qd24 blocking matrix matches a brute-force two-strategy replay") {
    val ds = docs().map(d => (d._1, d._2.split(" ").toSet))
    val hs = ds.map { case (id, ts) => (id, ts.map(rollHash)) }
    // exact truth: all-pairs J >= 0.8 over token-hash sets
    val exact = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      (a, ha) = hs(i); (b, hb) = hs(j)
      inter = (ha intersect hb).size
      if 10L * inter >= 8L * (ha.size + hb.size - inter)
    } yield (math.min(a, b), math.max(a, b))).toSet
    // classic MinHash 16 hashes / 4 bands
    def sig(h: Set[Long]): IndexedSeq[Long] = (0 until 16).map { i =>
      val (pa, pb) = (1000003L * i + 12345L, 777767L * i + 13L)
      h.map(x => (pa * x + pb) % P).min
    }
    val msig = hs.map { case (id, h) => (id, sig(h)) }
    def bandPairs[K](keys: Seq[(Long, IndexedSeq[K])]): Set[(Long, Long)] =
      (for {
        i <- keys.indices; j <- (i + 1) until keys.length
        if keys(i)._2.indices.exists(b => keys(i)._2(b) == keys(j)._2(b))
      } yield (math.min(keys(i)._1, keys(j)._1),
        math.max(keys(i)._1, keys(j)._1))).toSet
    val mcand = bandPairs(msig.map { case (id, sg) =>
      (id, (0 until 4).map(b => sg.slice(4 * b, 4 * b + 4).toList)) }.toSeq)
    // OPH 16 slots / 4 bands with cyclic densification
    val okeys = hs.map { case (id, h) =>
      val bins = (0 until 16).map(i =>
        h.filter(_ % 16 == i).map(_ / 16) match {
          case s if s.isEmpty => None
          case s => Some(s.min)
        })
      val ds16 = (0 until 16).map { i =>
        val j = (0 until 16).find(j => bins((i + j) % 16).isDefined).get
        bins((i + j) % 16).get + j * 1000000000L
      }
      (id, (0 until 4).map(b => ds16.slice(4 * b, 4 * b + 4)
        .foldLeft(0L)((acc, x) => (acc * 31 + x) % P)))
    }
    val ocand = bandPairs(okeys.toSeq)
    def r4(v: Double): Double =
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Seq(
      ("minhash16x4", exact.size.toLong, mcand.size.toLong,
        (exact intersect mcand).size.toLong),
      ("oph16x4", exact.size.toLong, ocand.size.toLong,
        (exact intersect ocand).size.toLong))
      .map { case (n, ne, nc, nh) =>
        (n, ne, nc, nh,
          if (ne == 0) None else Some(r4(nh.toDouble / ne)),
          if (nc == 0) None else Some(r4(nh.toDouble / nc)))
      }
    val got = SparkEntry.queries("qd24_blockeval")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(want.head._2 > 0, "no exact pairs at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  test("qe8 embedding audit matches a brute-force corpus replay") {
    val vecs = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray.map(v =>
        math.floor(v.toDouble * 1e7).toLong))
    val n2s = vecs.map(_.map(v => v * v).sum)
    val gs = n2s.map(_ / 10000000L).sorted
    def q(p: Int): Long = {
      // smallest gridded value whose cumulative count reaches the rank
      val rank = (gs.length - 1) * p / 10 + 1
      gs(rank - 1)
    }
    val want = (vecs.length.toLong,
      vecs.map(_.length).distinct.length.toLong,
      n2s.count(_ == 0L).toLong,
      (vecs.length - vecs.map(_.toSeq).distinct.length).toLong,
      q(1), q(5), q(9))
    val got = SparkEntry.queries("qe8_vecaudit")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).head
    assert(got === want)
    assert(want._1 > 0L && want._5 <= want._7, "degenerate audit row")
  }

  test("q146 tolerance as-of matches a brute-force bounded-range max") {
    val tolUs = 8500L * 86400000000L
    def us(ldt: java.time.LocalDateTime): Long =
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L
    val orders = spark.read.parquet(s"${TestSpark.Sf}/orders.parquet")
      .select("o_custkey", "o_orderdate").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getLong(0), us(r.getAs[java.time.LocalDateTime](1))))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val want = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_id", "user_id", "ts").collect()
      .map { r =>
        val id = r.getLong(0)
        val t = if (r.isNullAt(2)) None
          else Some(us(r.getAs[java.time.LocalDateTime](2)))
        val best = for {
          tv <- t
          u <- if (r.isNullAt(1)) None else Some(r.getLong(1))
          os <- orders.get(u)
          b <- os.filter(o => o <= tv && tv - o <= tolUs).lastOption
        } yield (b, tv - b)
        (id, best.map(_._1), best.map(_._2))
      }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("q146_asoftol")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None
        else Some(us(r.getAs[java.time.LocalDateTime](1))),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(want.exists(_._2.isDefined) && want.exists(_._2.isEmpty),
      "tolerance never partitions at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  test("q145 gzip round trip: compressed files on disk, values intact") {
    val got = SparkEntry.queries("q145_gzip")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // brute force from the parquet source (the oracle's end-state view)
    val rows = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .selectExpr("l_orderkey", "cast(l_linenumber as bigint)",
        "l_extendedprice", "l_returnflag").collect()
      .filter(r => r.getLong(0) % 10 == 4)
      .map(r => (r.getString(3), r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)))
    val want = rows.groupBy(_._1).toSeq.map { case (fl, rs) =>
      (fl, rs.size.toLong,
        rs.map(_._4).sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        rs.map(_._2).min, rs.map(_._2).max, rs.map(_._3).sum)
    }.sortBy(_._1)
    assert(want.nonEmpty)
    assert(got === want)
    // the files on disk must actually BE gzip members (magic 1f 8b)
    val dir = new java.io.File("target/graft-gzip/" +
      TestSpark.Sf.replaceAll("[^A-Za-z0-9]", "_"))
    val gz = dir.listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(gz.nonEmpty, "no .json.gz outputs written")
    val head = new Array[Byte](2)
    val in = new java.io.FileInputStream(gz.head)
    try { in.read(head) } finally in.close()
    assert((head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b,
      "output file is not gzip-framed")
  }

  /** The family's shared capped co-purchase edge build, replayed with
    * plain collections: distinct (order, part), keep each order's 64
    * smallest parts, project within-order pairs, keep pairs seen in
    * ≥ 2 orders. Returns u < v edges. */
  private def copurchaseEdges(): Set[(Long, Long)] = {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairs = rows.groupBy(_._1).toSeq.flatMap { case (_, ps) =>
      val kept = ps.map(_._2).sorted.take(64)
      for (i <- kept.indices; j <- (i + 1) until kept.length)
        yield (kept(i), kept(j))
    }
    pairs.groupBy(identity).filter(_._2.size >= 2).keySet
  }

  test("q150 link-prediction candidates match a brute-force replay") {
    val e = copurchaseEdges()
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    e.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      x = nodes(i); z = nodes(j)
      if !e.contains((x, z))
      cn = (adj(x) intersect adj(z)).size.toLong
      if cn >= 1L
    } yield (x, z, cn, adj(x).size.toLong, adj(z).size.toLong,
      r6(cn.toDouble / (adj(x).size + adj(z).size - cn))))
      .sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q150_linkpred")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(want.nonEmpty, "no candidates at sf0.001 — gate is vacuous")
    assert(got === want)
  }

  test("q151 local clustering coefficients match a brute-force replay") {
    val e = copurchaseEdges()
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    e.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u }
    val want = adj.keys.toSeq.sorted.map { n =>
      val nb = adj(n).toSeq
      val tri = (for {
        i <- nb.indices; j <- (i + 1) until nb.length
        (a, b) = (math.min(nb(i), nb(j)), math.max(nb(i), nb(j)))
        if e.contains((a, b))
      } yield 1).size.toLong
      val deg = nb.size.toLong
      val lcc = if (deg < 2L) None
        else Some(r6(2.0 * tri / (deg * (deg - 1L))))
      (n, deg, tri, lcc)
    }
    val got = SparkEntry.queries("q151_localcc")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(want.exists(_._3 > 0L), "no triangles at sf0.001 — vacuous")
    assert(got === want)
  }

  test("q152 lagged cross-correlation matches a brute-force replay") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "ts", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map { r =>
        val ts = r.get(1) match {
          case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
          case t: java.time.LocalDateTime => t.toLocalDate
          case t: java.time.Instant =>
            t.atZone(java.time.ZoneOffset.UTC).toLocalDate
        }
        (r.getString(0), ts, math.floor(r.getDouble(2) * 100).toLong)
      }
    val daily = rows.groupBy(r => (r._1, r._2)).map { case ((ty, dy), g) =>
      (ty, dy) -> g.map(_._3).sum / 1000L
    }
    val types = daily.keys.map(_._1).toSeq.distinct.sorted
    val want = (for {
      ta <- types; tb <- types if ta != tb; lag <- 1 to 3
    } yield {
      val pairs = daily.collect { case ((t, dy), xa) if t == ta =>
        daily.get((tb, dy.plusDays(lag))).map(xb => (xa, xb)) }
        .flatten.toSeq
      val n = pairs.length.toLong
      if (n == 0) None else {
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val num = n * sxy - sx * sy
        val dx = n * sxx - sx * sx; val dy2 = n * syy - sy * sy
        val r = if (dx <= 0L || dy2 <= 0L) None
          else Some(r6(num.toDouble
            / (math.sqrt(dx.toDouble) * math.sqrt(dy2.toDouble))))
        Some((ta, tb, lag.toLong, n, num, dx, dy2, r))
      }
    }).flatten.sortBy(t => (t._1, t._2, t._3))
    val got = SparkEntry.queries("q152_xcorr")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toSeq
    assert(want.nonEmpty && want.exists(_._8.isDefined),
      "no computable r at sf0.001 — gate is vacuous")
    got.zip(want).foreach { case (g, w) =>
      assert(g.copy(_8 = None) === w.copy(_8 = None), s"audit: $g != $w")
      (g._8, w._8) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) <= 2e-6)
        case (x, y) => assert(x == y)
      }
    }
  }

  test("q149 BH step-up matches a brute-force replay (incl. interior rows)") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "ts", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map { r =>
        val day = r.get(1) match {
          case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
          case t: java.time.LocalDateTime => t.toLocalDate
          case t: java.time.Instant =>
            t.atZone(java.time.ZoneOffset.UTC).toLocalDate
        }
        (r.getString(0), day, math.floor(r.getDouble(2) * 100).toLong)
      }
    val daily = rows.groupBy(r => (r._1, r._2)).map { case ((ty, dy), g) =>
      (ty, dy, g.map(_._3).sum / 1000L) }.toSeq
    val byType = daily.groupBy(_._1)
    val tests = daily.map { case (ty, dy, x) =>
      val hs = byType(ty)
      (ty, dy, x, hs.count(_._3 >= x).toLong, hs.size.toLong)
    }
    val m = tests.size.toLong
    val ranked = tests.sortBy { case (ty, dy, _, num, den) =>
      (num.toDouble / den, ty, dy.toString) }.zipWithIndex
      .map { case (t, i) => (t, i + 1L) }
    val k = ranked.filter { case ((_, _, _, num, den), rnk) =>
      20L * num * m <= rnk * den }.map(_._2).maxOption.getOrElse(0L)
    val want = ranked.map { case ((ty, dy, x, num, den), rnk) =>
      (ty, dy.toString, x, num, den, m, rnk, rnk <= k)
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q149_bhfdr")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), String.valueOf(r.get(1)),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getBoolean(7))).toSeq
    // the shipped corpus is NULL data (every day drawn from its type's
    // own distribution) — a correct FDR screen rejects nothing, and
    // that all-false column is the verified contract (the step-up
    // mechanics are exercised on the planted relation below)
    assert(k == 0L && want.forall(!_._8),
      "null-data corpus unexpectedly produced BH rejections")
    assert(got === want)
  }

  test("bhStepUp rejects interior failing ranks on a planted relation") {
    import spark.implicits._
    // m = 5, alpha = 1/20; p = .012/.019/.028 all pass or fail so that
    // rank 1 FAILS its own inequality (20*12*5=1200 > 1*1000) but rank
    // 3 passes (20*28*5=2800 <= 3*1000) -> k=3 rejects ranks 1-3
    // including the interior failures; .900/.950 stay accepted
    val tests = Seq(("a", 12L), ("b", 19L), ("c", 28L),
      ("d", 900L), ("e", 950L))
      .toDF("tid", "p_num")
      .withColumn("p_den", org.apache.spark.sql.functions.lit(1000L))
    val got = graft.queries.Relational.bhStepUp(tests, Seq("tid"))
      .select("tid", "rnk", "reject").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set(("a", 1L, true), ("b", 2L, true),
      ("c", 3L, true), ("d", 4L, false), ("e", 5L, false)))
    // and the defining counterexample: rank 1 alone would NOT pass
    assert(20L * 12L * 5L > 1L * 1000L)
  }

  test("qx18 grouped split matches a replay over qd5's verified groups") {
    // delta-only replay (the qd21 convention): components come from
    // qd5 — itself brute-forced by DedupSpec — so this gate replays
    // the NEW logic: representative assignment, LCG buckets, labels
    val comps = SparkEntry.queries("qd5_dupgroups")(spark, TestSpark.Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.OpCaches.releaseAll()
    val docIds = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    def lcg(x: Long) =
      ((1103515245L * (x % 2147483648L) + 12345L) % 2147483648L) % 10L
    def label(b: Long) =
      if (b <= 7L) "train" else if (b == 8L) "val" else "test"
    val grp = docIds.map(id => id -> comps.getOrElse(id, id)).toMap
    val size = grp.values.groupBy(identity).map { case (g, xs) =>
      g -> xs.size.toLong }
    val want = docIds.map { id =>
      val g = grp(id)
      val (sp, dsp) = (label(lcg(g)), label(lcg(id)))
      (id, g, size(g), sp, dsp, sp != dsp)
    }.toSeq
    val got = SparkEntry.queries("qx18_groupsplit")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getBoolean(5))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(want.exists(_._3 > 1L), "no multi-doc group — gate is vacuous")
    assert(want.exists(_._6), "no moved doc — leakage delta is vacuous")
    assert(want.exists(t => t._3 > 1L && !t._6),
      "every grouped doc moved — doc_split column is vacuous")
    assert(got === want)
  }

  test("q153 decayed leaderboard matches a brute-force replay") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "user_id", "ts", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3))
      .map { r =>
        val day = r.get(2) match {
          case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
          case t: java.time.LocalDateTime => t.toLocalDate
          case t: java.time.Instant =>
            t.atZone(java.time.ZoneOffset.UTC).toLocalDate
        }
        (r.getString(0), r.getLong(1), day,
          math.floor(r.getDouble(3) * 100).toLong)
      }
    val anchor = rows.map(_._3).max
    val sums = rows.groupBy(r => (r._1, r._2)).map { case ((ty, u), g) =>
      val s = g.map { r =>
        val age = java.time.temporal.ChronoUnit.DAYS
          .between(r._3, anchor)
        BigInt(r._4) * BigInt(1L << (20L - math.min(age, 20L)).toInt)
      }.sum
      (ty, u, s)
    }.toSeq
    assert(sums.exists { case (_, _, s) => s.toString.length > 9 },
      "decayed sums all tiny — weight scaling is vacuous")
    val limbB = BigInt("1000000000000000000")
    val want = sums.groupBy(_._1).toSeq.flatMap { case (ty, us) =>
      us.sortBy { case (_, u, s) => (-BigDecimal(s), u) }.take(10)
        .zipWithIndex.map { case ((_, u, s), i) =>
          // the published contract: smicro = floor((s·15625+8192)/16384)
          // == s/2²⁰ rounded half-up at 6 dp in integer micro-units;
          // both integers published as base-10^18 BIGINT limbs
          val micros = (s * 15625 + 8192) / 16384
          (ty, i + 1L, u, (s / limbB).toLong, (s % limbB).toLong,
            (micros / limbB).toLong, (micros % limbB).toLong) }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q153_decay")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    // ages past the 20-day floor must exist (the min() branch is real)
    assert(rows.exists(r => java.time.temporal.ChronoUnit.DAYS
      .between(r._3, anchor) > 20L), "no event older than the floor")
    assert(got === want)
  }

  test("g11 street stats cross-foot against g02's matched relation") {
    val matched = SparkEntry.queries("g02_nearest")(spark, TestSpark.Sf)
      .collect().filter(!_.isNullAt(1))
      .map(r => (r.getString(1), r.getLong(2)))
    val want = matched.groupBy(_._1).map { case (sid, hs) =>
      val ds = hs.map(_._2)
      (sid, hs.length.toLong, ds.min, ds.max, ds.sum,
        r6(ds.sum.toDouble / hs.length))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("g11_streetstats")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(want.nonEmpty && want.exists(_._2 > 1L),
      "no street with >1 house — aggregation is vacuous")
    assert(got === want)
  }

  test("qd25 winnowing selections match a brute-force replay") {
    val K = 4; val W = 5
    val ds = docs().map(d => (d._1, d._2.split(" "))).filter(_._2.length >= 8)
    val sels = ds.map { case (id, tk) =>
      val hs = (0 to tk.length - K).map(p =>
        rollHash(tk.slice(p, p + K).mkString(" ")))
      val picks = (0 to hs.length - W).flatMap { s =>
        val sl = hs.slice(s, s + W)
        val mn = sl.min
        val p = s + sl.lastIndexOf(mn) // rightmost tie
        Some((mn, (p + 1).toLong))     // 1-based position
      }.distinct
      (id, hs.length.toLong, picks)
    }
    val fpDocs = sels.flatMap { case (id, _, ps) =>
      ps.map(_._1).distinct.map(h => (h, id)) }
    val sharedH = fpDocs.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
    val want = sels.map { case (id, ng, ps) =>
      val nSel = ps.size.toLong
      val nSh = ps.map(_._1).distinct.count(sharedH).toLong
      (id, ng, nSel, nSh, r6(nSel.toDouble / ng))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("qd25_winnow")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    graft.operators.OpCaches.releaseAll()
    assert(want.exists(_._4 > 0L) && want.exists(_._4 == 0L),
      "shared-fingerprint signal is vacuous at sf0.001")
    // the winnowing guarantee itself: every pair of docs sharing a run
    // of >= W+K-1 tokens shares at least one SELECTED fingerprint —
    // spot-check via qd22's duplicated spans (length >= 8 tokens)
    assert(got === want)
  }

  test("q155 nearest as-of picks match a brute-force replay") {
    def toUs(v: Any): Long = v match {
      case t: java.sql.Timestamp =>
        Math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000) % 1000000L
      case t: java.time.LocalDateTime =>
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000
      case t: java.time.Instant =>
        t.getEpochSecond * 1000000L + t.getNano / 1000
    }
    val ev = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_id", "event_type", "user_id", "ts").collect()
      .filter(r => !r.isNullAt(2) && !r.isNullAt(3))
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), toUs(r.get(3))))
    val buys = ev.filter(_._2 == "purchase").groupBy(_._3)
      .map { case (u, g) => u -> g.map(_._4).sorted.toVector }
    val want = ev.filter(_._2 == "click").toSeq.map { case (id, _, u, t) =>
      val ps = buys.getOrElse(u, Vector.empty[Long])
      val b = ps.filter(_ <= t).lastOption
      val f = ps.find(_ > t)
      val pickB = b.isDefined && (f.isEmpty || t - b.get <= f.get - t)
      val near = if (pickB) b else f
      (id, near, near.map(n => if (pickB) "b" else "f"),
        near.map(n => math.abs(n - t)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("q155_asofnear")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(toUs(r.get(1))),
        if (r.isNullAt(2)) None else Some(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(want.exists(_._3.contains("b")) && want.exists(_._3.contains("f")),
      "one of the nearest arms is vacuous at sf0.001")
    assert(got === want)
  }

  /** Shared per-(type, arm) observation build for the K-group tests:
    * per-user binned sums v = (Σcents) div 1000, arm = user_id % 4. */
  private def armObs(): Map[String, Seq[(Long, Long)]] = {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "user_id", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100).toLong))
    rows.groupBy(_._1).map { case (ty, rs) =>
      ty -> rs.groupBy(_._2).toSeq.map { case (u, es) =>
        ((((u % 4) + 4) % 4), es.map(_._3).sum / 1000L)
      }
    }
  }

  test("q147 one-way ANOVA F matches a brute-force replay") {
    val want = armObs().toSeq.map { case (ty, vs) =>
      val arms = (0 to 3).map(k => vs.filter(_._1 == k).map(_._2))
      val n = arms.map(_.length.toLong)
      val sm = arms.map(_.sum)
      val q = arms.map(_.map(v => v * v).sum)
      val nAll = n.sum; val sAll = sm.sum
      val gm = sAll.toDouble / nAll
      val ssb = (0 to 3).map { k =>
        val dk = sm(k).toDouble / n(k) - gm; n(k) * dk * dk }.sum
      val ssw = (0 to 3).map(k =>
        q(k).toDouble - sm(k).toDouble * sm(k) / n(k)).sum
      val ok = n.forall(_ >= 2L) && ssw > 0.0
      val f = if (!ok) None
        else Some(r6((ssb / 3.0) / (ssw / (nAll - 4L))))
      (ty, nAll, n(0), sm(0), q(0), n(1), sm(1), q(1),
        n(2), sm(2), q(2), n(3), sm(3), q(3), f)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q147_anova")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10),
        r.getLong(11), r.getLong(12), r.getLong(13),
        if (r.isNullAt(14)) None else Some(r.getDouble(14)))).toSeq
    assert(want.nonEmpty && want.exists(_._15.isDefined),
      "no computable F at sf0.001 — gate is vacuous")
    // float trees may differ in the last ulp between the replay's scalar
    // order and the engines' identical columnar tree; the AUDIT sums
    // must be exact, F to the 1e-6 grid with one-ulp-of-round slack
    got.zip(want).foreach { case (g, w) =>
      assert(g.copy(_15 = None) === w.copy(_15 = None), s"audit: $g != $w")
      (g._15, w._15) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) <= 2e-6)
        case (a, b) => assert(a == b)
      }
    }
  }

  test("q148 Kruskal-Wallis H matches a brute-force replay") {
    val want = armObs().toSeq.map { case (ty, vs) =>
      val sorted = vs.map(_._2).distinct.sorted
      val ct = sorted.map(v => v -> vs.count(_._2 == v).toLong).toMap
      var cl = 0L
      val w2 = Array.fill(4)(0L); var ts3 = 0L
      sorted.foreach { v =>
        val c = ct(v)
        val r2 = 2L * cl + c + 1L
        (0 to 3).foreach { k =>
          w2(k) += vs.count(o => o._1 == k && o._2 == v) * r2 }
        ts3 += c * c * c - c
        cl += c
      }
      val n = vs.length.toLong
      val nk = (0 to 3).map(k => vs.count(_._1 == k).toLong)
      val nd = n.toDouble
      val corr = 1.0 - ts3.toDouble / (nd * nd * nd - nd)
      val ok = nk.forall(_ >= 1L) && corr > 0.0
      val h = if (!ok) None else {
        val sumr = (0 to 3).map(k => w2(k).toDouble * w2(k) / nk(k)).sum
        Some(r6((12.0 * sumr / (4.0 * nd * (nd + 1.0))
          - 3.0 * (nd + 1.0)) / corr))
      }
      (ty, n, nk(0), nk(1), nk(2), nk(3),
        w2(0), w2(1), w2(2), w2(3), ts3, h)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q148_kruskal")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10),
        if (r.isNullAt(11)) None else Some(r.getDouble(11)))).toSeq
    assert(want.nonEmpty && want.exists(_._12.isDefined),
      "no computable H at sf0.001 — gate is vacuous")
    got.zip(want).foreach { case (g, w) =>
      assert(g.copy(_12 = None) === w.copy(_12 = None), s"audit: $g != $w")
      (g._12, w._12) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) <= 2e-6)
        case (a, b) => assert(a == b)
      }
    }
  }
}
