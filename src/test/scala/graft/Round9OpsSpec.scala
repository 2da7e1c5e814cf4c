package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side brute-force oracles for the round-9 additions (q130
  * jackknife, q131 assortativity, q132 Theil–Sen, q133 BFS, qt25 BPE,
  * qx15 bootstrap, qm7 audio): each statistic is recomputed from the
  * raw sf0.001 parquet with plain Scala collections — INDEPENDENT
  * implementations (e.g. qt25's merge is an explicit index scan here
  * vs the query's string-replace encoding) — and the distributed plans
  * must reproduce the integer audit columns bit-for-bit and the
  * rounded doubles to the declared grid. */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** micros that survive Timestamp's milli truncation (verify gotcha);
    * raw parquet reads of events.ts can surface TIMESTAMP_NTZ →
    * LocalDateTime (identity with TIMESTAMP under the pinned UTC
    * session tz), so accept both. */
  private def micros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    case l: java.time.LocalDateTime =>
      l.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        l.getNano / 1000
    case other => sys.error(s"unexpected ts type: $other")
  }

  /** the capped co-purchase graph q123/q127/q131/q133 share:
    * distinct (order, part), top-64 parts per order by partkey, pairs
    * seen together >= 2 times, symmetrized. Returns the directed
    * (symmetric) edge list. */
  private def copurchaseEdges(): Seq[(Long, Long)] = {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val capped = rows.groupBy(_._1).toSeq.flatMap { case (o, g) =>
      g.map(_._2).sorted.take(64).map(p => (o, p))
    }
    val pairCnt = capped.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
      // .toSeq BEFORE collect: collecting 2-tuples out of a Map would
      // rebuild a Map and silently dedup edges by their first endpoint
    }.groupBy(identity).toSeq.collect { case (k, v) if v.size >= 2 => k }
    pairCnt ++ pairCnt.map { case (u, v) => (v, u) }
  }

  test("q130 jackknife matches a driver-side brute force") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "user_id", "value", "ts").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3))
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        Math.floorDiv(micros(r.get(3)), 86400000000L)))

    val strat = rows.groupBy(r => (r._1, r._4)).map { case ((et, day), g) =>
      (et, day, g.map(r => math.floor(r._3 * 100).toLong).sum,
        g.map(_._2).distinct.size.toLong)
    }.toSeq

    val expected = strat.groupBy(_._1).map { case (et, g) =>
      val k = g.size.toLong
      val sNum = g.map(_._3).sum
      val sDen = g.map(_._4).sum
      val t6 = g.map(s => ((sNum - s._3) * 1000000L) / (sDen - s._4))
      val sumT6 = t6.sum
      val m = sumT6 / k
      val r = sumT6 - m * k
      val ssd = t6.map(x => (x - m) * (x - m)).sum
      val vexp = (k - 1).toDouble / k *
        (math.max(ssd.toDouble - r.toDouble * r / k, 0.0) / 1e12)
      et -> ((k, sNum, sDen, sumT6, r, ssd, sNum.toDouble / sDen, vexp))
    }

    val got = SparkEntry.queries("q130_jackknife")(spark, TestSpark.Sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (k, sn, sd, st6, rr, ssd, theta, vexp) = expected(r.getString(0))
      assert(r.getLong(1) == k && r.getLong(2) == sn && r.getLong(3) == sd)
      assert(r.getLong(4) == st6 && r.getLong(5) == rr && r.getLong(6) == ssd)
      assert(math.abs(r.getDouble(7) - theta) <= 5e-7)
      assert(math.abs(r.getDouble(8) - vexp) <= 5e-7)
      assert(math.abs(r.getDouble(9) - math.sqrt(vexp)) <= 5e-7)
    }
  }

  test("q131 assortativity matches a driver-side brute force") {
    val sym = copurchaseEdges()
    val deg = sym.groupBy(_._1).map { case (u, g) => u -> g.size.toLong }
    val m = sym.size.toLong
    val sx = sym.map(e => deg(e._1)).sum
    val sxx = sym.map(e => deg(e._1) * deg(e._1)).sum
    val sxy = sym.map(e => deg(e._1) * deg(e._2)).sum
    // symmetric edge list: endpoint degree moments agree on both ends
    assert(sym.map(e => deg(e._2)).sum == sx)

    val got = SparkEntry.queries("q131_assort")(spark, TestSpark.Sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == m && r.getLong(1) == sx)
    assert(r.getLong(2) == sxx && r.getLong(3) == sxy)
    assert(r.getLong(4) == m * sxy - sx * sx)
    assert(r.getLong(5) == m * sxx - sx * sx)
    val rr = (m * sxy - sx * sx).toDouble / (m * sxx - sx * sx)
    assert(math.abs(r.getDouble(6) - rr) <= 5e-7)
    assert(rr >= -1.0 && rr <= 1.0)
  }

  test("q132 Theil-Sen matches a driver-side brute force (floorDiv on negatives)") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "value", "ts").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong,
        Math.floorDiv(micros(r.get(2)), 86400000000L)))

    val daily = rows.groupBy(r => (r._1, r._3)).map { case ((et, d), g) =>
      (et, d, g.map(_._2).sum)
    }.toSeq

    val expected = daily.groupBy(_._1).map { case (et, g) =>
      val ds = g.sortBy(_._2)
      val slopes = (for {
        i <- ds.indices; j <- (i + 1) until ds.length
      } yield Math.floorDiv((ds(j)._3 - ds(i)._3) * 1000000L,
        ds(j)._2 - ds(i)._2)).sorted
      val np = slopes.length.toLong
      val lo = ((np + 1) / 2).toInt
      val hi = (np / 2 + 1).toInt
      val med2 = slopes(lo - 1) + slopes(hi - 1)
      // at least one negative pairwise slope exercises the floor path
      et -> ((ds.length.toLong, np, med2, slopes.exists(_ < 0)))
    }
    assert(expected.values.exists(_._4),
      "fixture has no negative slope — the floor-division path is untested")

    val got = SparkEntry.queries("q132_theilsen")(spark, TestSpark.Sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nd, np, med2, _) = expected(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == np)
      assert(r.getLong(3) == med2,
        s"${r.getString(0)}: med2 ${r.getLong(3)} != $med2")
      assert(math.abs(r.getDouble(4) - med2.toDouble / 2e6) <= 5e-7)
    }
  }

  test("q138 Mann-Kendall matches a driver-side brute force") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "value", "ts").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong,
        Math.floorDiv(micros(r.get(2)), 86400000000L)))
    val daily = rows.groupBy(r => (r._1, r._3)).map { case ((et, d), g) =>
      (et, d, g.map(_._2).sum)
    }.toSeq

    val expected = daily.groupBy(_._1).map { case (et, g) =>
      val ds = g.sortBy(_._2).map(_._3)
      val n = ds.length.toLong
      var s = 0L
      for (i <- ds.indices; j <- (i + 1) until ds.length)
        s += java.lang.Long.signum(ds(j) - ds(i))
      val tie18 = ds.groupBy(identity).values
        .map(_.length.toLong).map(t => t * (t - 1) * (2 * t + 5)).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tie18
      val num = if (s > 0) s - 1 else if (s < 0) s + 1 else 0L
      et -> ((n, n * (n - 1) / 2, s, var18, num))
    }

    val got = SparkEntry.queries("q138_mannkendall")(spark, TestSpark.Sf)
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, n0, s, var18, num) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == n0)
      assert(r.getLong(3) == s, s"${r.getString(0)}: S")
      assert(r.getLong(4) == var18 && r.getLong(5) == num)
      val z = num.toDouble / math.sqrt(var18.toDouble / 18.0)
      assert(math.abs(r.getDouble(6) - z) <= 5e-7)
      val trend = if (r.getDouble(6) >= 1.96) "up"
        else if (r.getDouble(6) <= -1.96) "down" else "none"
      assert(r.getString(7) == trend)
    }
  }

  test("q133 BFS hop distance matches a driver-side BFS") {
    val sym = copurchaseEdges()
    val nodes = sym.map(_._1).distinct
    val adj = sym.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).toSet }
    var dist = nodes.filter(_ % 97 == 0).map(_ -> 0L).toMap
    var frontier = dist.keySet
    for (r <- 1 to 4) {
      val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty[Long]))
        .diff(dist.keySet)
      dist = dist ++ nxt.map(_ -> r.toLong)
      frontier = nxt
    }

    val got = SparkEntry.queries("q133_bfshop")(spark, TestSpark.Sf).collect()
    assert(got.length == dist.size)
    got.foreach { r =>
      assert(dist(r.getLong(0)) == r.getLong(1),
        s"node ${r.getLong(0)}: dist ${r.getLong(1)} != ${dist(r.getLong(0))}")
      assert(r.getLong(2) == nodes.size.toLong)
      assert(r.getLong(3) == dist.size.toLong)
    }
    // the budget must actually expand: some node sits at full depth
    assert(got.exists(_.getLong(1) == 4L) || dist.size == nodes.size)
  }

  test("q137 personalized PageRank matches a driver-side power iteration") {
    val sym = copurchaseEdges()
    val deg = sym.groupBy(_._1).map { case (u, g) => u -> g.size.toLong }
    val nodes = sym.map(_._1).distinct
    val inN = sym.groupBy(_._2).map { case (v, g) => v -> g.map(_._1) }
    var rank = nodes.map(n =>
      n -> (if (n % 97 == 0) 1000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      rank = nodes.map { v =>
        val sc = inN.getOrElse(v, Seq.empty)
          .map(u => rank(u) / deg(u)).sum
        v -> ((if (v % 97 == 0) 150000L else 0L) + 85L * sc / 100L)
      }.toMap
    }
    val top = rank.toSeq.filter(_._2 > 0)
      .sortBy { case (n, r) => (-r, n) }.take(25)

    val got = SparkEntry.queries("q137_ppr")(spark, TestSpark.Sf).collect()
    assert(got.length == 25)
    got.zip(top).foreach { case (r, (n, rk)) =>
      assert(r.getLong(0) == n && r.getLong(1) == rk,
        s"(${r.getLong(0)},${r.getLong(1)}) != ($n,$rk)")
    }
    // seeds hold teleport mass: at least one seed ranks in the top-25
    assert(top.exists(_._1 % 97 == 0))
  }

  test("qt25 BPE: string-replace merge == explicit greedy scan, 6 rounds") {
    val words = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).split(" "))
      .filter(_.matches("^[a-z]+$"))
    var vocab: Seq[(Vector[String], Long)] = words.groupBy(identity).toSeq
      .map { case (w, g) => (w.map(_.toString).toVector, g.length.toLong) }

    def mergeGreedy(syms: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }

    val expected = (1 to 6).map { step =>
      val pairs = vocab.flatMap { case (syms, cnt) =>
        syms.sliding(2).collect { case Vector(a, b) => ((a, b), cnt) }
      }.groupBy(_._1).map { case (p, g) => (p, g.map(_._2).sum) }
      val ((l, r), pcnt) = pairs.minBy { case ((l, r), c) => (-c, l, r) }
      vocab = vocab.map { case (syms, cnt) => (mergeGreedy(syms, l, r), cnt) }
      val totSyms = vocab.map { case (syms, cnt) => syms.length * cnt }.sum
      (step.toLong, l, r, l + r, pcnt, totSyms)
    }

    val got = SparkEntry.queries("qt25_bpe")(spark, TestSpark.Sf).collect()
    assert(got.length == 6)
    got.zip(expected).foreach { case (row, (step, l, r, merged, pcnt, tot)) =>
      assert(row.getLong(0) == step)
      assert(row.getString(1) == l && row.getString(2) == r,
        s"step $step: merge (${row.getString(1)},${row.getString(2)}) != ($l,$r)")
      assert(row.getString(3) == merged)
      assert(row.getLong(4) == pcnt, s"step $step: pcnt")
      assert(row.getLong(5) == tot, s"step $step: tot_syms")
    }
    // conservation: each merge removes exactly pcnt symbols
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(5) - b.getLong(5) == b.getLong(4))
    }
  }

  test("qx15 bootstrap matches a driver-side replay of the LCG draws") {
    val cuts = Seq(790015084L, 1580030168L, 1975037710L, 2106706891L,
      2139624186L, 2146207645L)
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "event_id", "value").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getLong(1),
        math.floor(r.getDouble(2) * 100).toLong))

    def lowerMedian(weighted: Seq[(Long, Long)]): Long = { // (v, w) sorted
      val n = weighted.map(_._2).sum
      val target = (n + 1) / 2
      var cum = 0L
      weighted.foreach { case (v, w) =>
        cum += w; if (cum >= target) return v
      }
      sys.error("empty histogram")
    }

    val expected = rows.groupBy(_._1).map { case (et, g) =>
      val point = lowerMedian(
        g.groupBy(_._3).toSeq.map { case (v, h) => (v, h.size.toLong) }
          .sortBy(_._1))
      val bmeds = (0L until 32L).map { b =>
        val wts = g.map { r =>
          val u = (1103515245L * ((r._2 * 32 + b) % 2147483648L) + 12345L) %
            2147483648L
          (r._3, cuts.count(u >= _).toLong)
        }.filter(_._2 > 0)
        b -> lowerMedian(wts.groupBy(_._1).toSeq
          .map { case (v, h) => (v, h.map(_._2).sum) }.sortBy(_._1))
      }
      val sortedMeds = bmeds.sortBy { case (b, m) => (m, b) }.map(_._2)
      et -> ((g.length.toLong, point, sortedMeds(3), sortedMeds(28)))
    }

    val got = SparkEntry.queries("qx15_bootstrap")(spark, TestSpark.Sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, med, lo, hi) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == 32L)
      assert(r.getLong(3) == med, s"${r.getString(0)}: point median")
      assert(r.getLong(4) == lo && r.getLong(5) == hi,
        s"${r.getString(0)}: CI (${r.getLong(4)},${r.getLong(5)}) != ($lo,$hi)")
      assert(lo <= med && med <= hi)
    }
  }

  test("q134 Kendall tau-b matches a driver-side brute force") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "value", "ts").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong,
        Math.floorDiv(micros(r.get(2)), 86400000000L)))
    val daily = rows.groupBy(r => (r._1, r._3)).map { case ((et, d), g) =>
      ((et, d), g.map(_._2).sum / 1000L)
    }
    val types = daily.keys.map(_._1).toSeq.distinct.sorted

    val expected = (for {
      ta <- types; tb <- types if ta < tb
    } yield {
      val shared = daily.keys.collect {
        case (t, d) if t == ta && daily.contains((tb, d)) => d
      }.toSeq.sorted
      val pts = shared.map(d => (daily((ta, d)), daily((tb, d))))
      var (nc, nd, n1, n2) = (0L, 0L, 0L, 0L)
      for (i <- pts.indices; j <- (i + 1) until pts.length) {
        val dx = pts(i)._1 - pts(j)._1
        val dy = pts(i)._2 - pts(j)._2
        if (dx == 0) n1 += 1
        if (dy == 0) n2 += 1
        if (dx > 0 && dy > 0 || dx < 0 && dy < 0) nc += 1
        if (dx > 0 && dy < 0 || dx < 0 && dy > 0) nd += 1
      }
      val n0 = pts.length.toLong * (pts.length - 1) / 2
      (ta, tb) -> ((n0, nc, nd, n1, n2))
    }).toMap

    val got = SparkEntry.queries("q134_kendall")(spark, TestSpark.Sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n0, nc, nd, n1, n2) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == n0 && r.getLong(3) == nc && r.getLong(4) == nd)
      assert(r.getLong(5) == n1 && r.getLong(6) == n2)
      val tau = (nc - nd).toDouble /
        (math.sqrt((n0 - n1).toDouble) * math.sqrt((n0 - n2).toDouble))
      assert(math.abs(r.getDouble(7) - tau) <= 5e-7)
      assert(tau >= -1.0 && tau <= 1.0)
    }
  }

  test("q135 join-cardinality estimate: exact replay AND one-sided soundness") {
    val li = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    import org.apache.spark.sql.functions.col
    def keys(pred: org.apache.spark.sql.Column) =
      li.filter(pred).select("l_partkey").collect().map(_.getLong(0))
    val a = keys(col("l_quantity") <= 25)
    val b = keys(col("l_quantity") > 25)
    val ca = a.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val cb = b.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val trueCard = ca.collect {
      case (k, n) if cb.contains(k) => n * cb(k)
    }.sum

    def cell(j: Long, k: Long): Long =
      (((1000003L * j + 12345L) * k + (777767L * j + 13L)) % 1000000007L) % 256L
    def sketch(ks: Array[Long]): Array[Array[Long]] = {
      val m = Array.fill(4)(Array.fill(256)(0L))
      ks.foreach(k => (0 until 4).foreach(j => m(j)(cell(j, k).toInt) += 1))
      m
    }
    val (sa, sb) = (sketch(a), sketch(b))
    val ests = (0 until 4).map(j =>
      (0 until 256).map(c => sa(j)(c) * sb(j)(c)).sum)

    val got = SparkEntry.queries("q135_joincard")(spark, TestSpark.Sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == a.length.toLong && r.getLong(1) == b.length.toLong)
    assert(r.getLong(2) == trueCard)
    (0 until 4).foreach(j => assert(r.getLong(3 + j) == ests(j), s"e$j"))
    assert(r.getLong(7) == ests.min)
    // CM inner-product one-sidedness: every row's estimate >= truth
    ests.foreach(e => assert(e >= trueCard))
    assert(r.getLong(9) == 1L)
  }

  test("qx16 DP sum: clip arithmetic and the sensitivity-scaled release") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val P = 1000000007L
    def rollHash(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % P)
    val cuts = Seq(332969L, 1238074L, 3698404L, 10386276L, 28565796L,
      77982853L, 212312343L, 577457755L, 1570025892L, 1935171304L,
      2069500794L, 2118917851L, 2137097371L, 2143785243L, 2146245573L,
      2147150678L)
    val expected = docs.groupBy(_._1).map { case (lang, g) =>
      val raw = g.map(_._2).sum
      val clipped = g.map(r => math.min(r._2, 500L)).sum
      val u = (1103515245L * (rollHash(lang) * 2 + 1) + 12345L) % 2147483648L
      val z = -8L + cuts.count(u >= _)
      lang -> ((g.length.toLong, raw, clipped, u, z))
    }
    val got = SparkEntry.queries("qx16_dpsum")(spark, TestSpark.Sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, raw, clipped, u, z) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == raw
        && r.getLong(3) == clipped)
      assert(r.getLong(4) == u && r.getLong(5) == z)
      assert(z >= -8L && z <= 8L)
      assert(r.getLong(6) == clipped + 500L * z)
      assert(r.getLong(7) == math.max(0L, clipped + 500L * z))
      assert(clipped <= raw)
    }
  }

  test("qt26 vocabulary growth: first-occurrence curve matches brute force") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ")
        .filter(_.matches("^[a-z]+$")).map(w => (r.getString(0), w)))
    val sources = rows.map(_._1).distinct.sorted
    val rank = sources.zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    val firstRank = rows.groupBy(_._2).map { case (w, g) =>
      w -> g.map(r => rank(r._1)).min
    }
    val nNew = firstRank.values.groupBy(identity)
      .map { case (r, g) => r -> g.size.toLong }
    val nTok = rows.groupBy(r => rank(r._1))
      .map { case (r, g) => r -> g.size.toLong }

    val got = SparkEntry.queries("qt26_vocabgrowth")(spark, TestSpark.Sf)
      .collect()
    assert(got.length == sources.length)
    var (vocab, tokens) = (0L, 0L)
    got.foreach { r =>
      val rk = r.getLong(0)
      vocab += nNew.getOrElse(rk, 0L)
      tokens += nTok(rk)
      assert(r.getString(1) == sources(rk.toInt - 1))
      assert(r.getLong(2) == nTok(rk) && r.getLong(3) == nNew.getOrElse(rk, 0L))
      assert(r.getLong(4) == vocab && r.getLong(5) == tokens)
    }
    // the curve ends at the whole corpus vocabulary, by construction
    assert(vocab == firstRank.size.toLong)
    assert(tokens == rows.length.toLong)
  }

  test("q136 quantile bins match a driver-side brute force (ties go low)") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("event_type", "value").collect()
      .filter(r => !r.isNullAt(1))
      .map(r => (r.getString(0), math.floor(r.getDouble(1) * 100).toLong))

    val expected = rows.groupBy(_._1).flatMap { case (et, g) =>
      val vs = g.map(_._2).sorted
      val n = vs.length.toLong
      // smallest value whose cumulative count reaches the rank ==
      // the rank-th element of the sorted multiset
      def q(pct: Long) = vs((((n - 1) * pct / 100) + 1 - 1).toInt)
      val (b1, b2, b3) = (q(25), q(50), q(75))
      g.map(_._2).groupBy(v =>
        1L + (if (v > b1) 1 else 0) + (if (v > b2) 1 else 0)
          + (if (v > b3) 1 else 0))
        .map { case (bk, vs2) =>
          (et, bk) -> ((vs2.length.toLong, vs2.min, vs2.max, b1, b2, b3))
        }
    }

    val got = SparkEntry.queries("q136_quantilebin")(spark, TestSpark.Sf)
      .collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, lo, hi, b1, b2, b3) = expected((r.getString(0), r.getLong(1)))
      assert(r.getLong(2) == n && r.getLong(3) == lo && r.getLong(4) == hi)
      assert(r.getLong(5) == b1 && r.getLong(6) == b2 && r.getLong(7) == b3)
    }
    // every type splits into at least 2 buckets on this fixture
    val perType = got.groupBy(_.getString(0)).map(_._2.length)
    assert(perType.forall(_ >= 2))
  }

  test("qm8 box walk matches the source formulas; size chain conserves") {
    val P = 1000000007L
    def rollHash(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % P)
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._1 % 11 == 0)

    val got = SparkEntry.queries("qm8_boxparse")(spark, TestSpark.Sf)
      .collect()
    assert(got.length == docs.length * 3)
    val byDoc = docs.toMap
    got.foreach { r =>
      val id = r.getLong(0)
      val idx = r.getLong(1).toInt
      val p = idx match {
        case 1 => id % 8 + 4
        case 2 => byDoc(id) % 8 + 4
        case 3 => (id * 3) % 8 + 8
      }
      assert(r.getString(2) == Seq("ftyp", "meta", "data")(idx - 1))
      assert(r.getLong(3) == p + 8, s"doc $id box $idx size")
      val hexImg = (0L until p).map(i =>
        f"${(i * 7 + id + 13 * idx) % 256}%02X").mkString
      assert(r.getLong(4) == rollHash(hexImg), s"doc $id box $idx fp")
      assert(r.getLong(5) == 1L, s"doc $id size chain broke")
    }
  }

  test("qe7 JL projection matches a driver-side replay; mean ratio near 1") {
    val rows = spark.read.parquet(s"${TestSpark.Sf}/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .filter(_.getSeq[Float](1).length == 64)
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong))
      .toMap
    def sign(i: Int, j: Int): Long =
      if ((1103515245L * (i * 16 + j) + 12345L) % 2147483648L >= 1073741824L)
        1L else -1L
    def proj(xi: Seq[Long]): Seq[Long] =
      (0 until 16).map(j => (0 until 64).map(i => sign(i, j) * xi(i)).sum)

    val expected = rows.keys.filter(v => v % 50 == 0 && rows.contains(v + 1))
      .toSeq.sorted.map { va =>
        val (xa, xb) = (rows(va), rows(va + 1))
        val d2o = xa.zip(xb).map { case (p, q) => (p - q) * (p - q) }.sum
        val (ya, yb) = (proj(xa), proj(xb))
        val d2p = ya.zip(yb).map { case (p, q) => (p - q) * (p - q) }.sum
        (va, d2o, d2p)
      }.filter(_._2 > 0)

    val got = SparkEntry.queries("qe7_jlproject")(spark, TestSpark.Sf)
      .collect()
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (r, (va, d2o, d2p)) =>
      assert(r.getLong(0) == va && r.getLong(1) == va + 1)
      assert(r.getLong(2) == d2o, s"pair $va: d2o")
      assert(r.getLong(3) == d2p, s"pair $va: d2p")
      val ratio = d2p.toDouble / 16.0 / d2o
      assert(math.abs(r.getDouble(4) - ratio) <= 5e-7)
    }
    // unbiasedness: the cross-pair mean ratio sits near 1 (k=16 keeps
    // per-pair scatter wide by design; the mean is the JL readout)
    val mean = got.head.getDouble(5)
    assert(got.forall(_.getDouble(5) == mean))
    assert(mean > 0.5 && mean < 2.0, s"mean ratio $mean")
  }

  test("qd20 phonetic blocks CONTAIN qd13's exact-token pairs; key matches reference Soundex fold") {
    // containment: equal first tokens hash to equal phonetic keys, so
    // every exact-token-blocked pair must reappear under the coarser
    // phonetic blocking (higher recall is the operator's point)
    val exact = SparkEntry.queries("qd13_jarowink")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val phon = SparkEntry.queries("qd20_soundexblock")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(phon),
      s"missing exact pairs: ${exact.diff(phon).take(5)}")
    assert(phon.size >= exact.size)

    // the declared key against an independent reference fold
    val classes = "01230120022455012623010202"
    def sdx(w: String): String = {
      val digits = w.map(ch => classes(ch - 'a'))
      val collapsed = digits.foldLeft(new StringBuilder) { (sb, ch) =>
        if (sb.nonEmpty && sb.last == ch) sb else sb.append(ch)
      }.toString
      val nz = collapsed.filter(_ != '0')
      w.head + nz.drop(1).take(3).padTo(3, '0')
    }
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").head))
      .filter(_._2.matches("^[a-z]+$")).toMap
    val gotKeys = SparkEntry.queries("qd20_soundexblock")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(gotKeys.nonEmpty)
    gotKeys.foreach { case (docA, key) =>
      assert(key == sdx(docs(docA)),
        s"doc $docA (${docs(docA)}): $key != ${sdx(docs(docA))}")
    }

    // the coarser blocks DO generate extra candidates (the recall
    // point) — counted driver-side; the jw >= 0.85 verify then decides
    val langOf = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    def pairs[K](key: Long => K): Long =
      docs.keys.toSeq.groupBy(id => (langOf(id), key(id)))
        .values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val candExact = pairs(id => docs(id))
    val candPhon = pairs(id => sdx(docs(id)))
    assert(candPhon > candExact,
      s"phonetic blocking generated no extra candidates ($candPhon vs $candExact)")
  }

  test("qx17 mix plan and q139 gains table match driver-side replays") {
    // qx17: feasible point / quotas / fixed-point rates
    val toks = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").length.toLong))
    val w = Map("en" -> 4L, "de" -> 2L, "zh" -> 2L, "fr" -> 1L, "es" -> 1L)
    val nTok = toks.groupBy(_._1).map { case (l, g) => l -> g.map(_._2).sum }
      .filter { case (l, _) => w.contains(l) }
    val k = nTok.map { case (l, n) => n / w(l) }.min
    val gotPlan = SparkEntry.queries("qx17_mixplan")(spark, TestSpark.Sf)
      .collect()
    assert(gotPlan.length == nTok.size)
    gotPlan.foreach { r =>
      val l = r.getString(0)
      assert(r.getLong(1) == nTok(l) && r.getLong(2) == w(l))
      assert(r.getLong(3) == k)
      assert(r.getLong(4) == w(l) * k)
      assert(r.getLong(5) == w(l) * k * 1000000L / nTok(l))
      assert(r.getLong(5) <= 1000000L) // downsample-only: rate <= 1
    }

    // q139: decile populations, cumulative gains, exact lift operands
    val users = spark.read.parquet(s"${TestSpark.Sf}/events.parquet")
      .select("user_id", "event_type", "value").collect()
      .filter(r => !r.isNullAt(0))
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) 0.0 else r.getDouble(2)))
      .groupBy(_._1).map { case (_, g) =>
        val score = g.filter(_._2 == "click")
          .map(e => math.floor(e._3 * 100).toLong).sum
        val label = if (g.count(_._2 == "purchase") >= 16) 1L else 0L
        (score, label)
      }.toSeq
    val n = users.length.toLong
    val sorted = users.map(_._1).sorted
    val bounds = (1 to 9).map(kk => sorted((((n - 1) * kk * 10 / 100) + 1 - 1).toInt))
    val byDec = users.groupBy { case (sc, _) =>
      11L - (1L + bounds.count(sc > _))
    }
    val got = SparkEntry.queries("q139_liftgains")(spark, TestSpark.Sf)
      .collect()
    assert(got.length == byDec.size)
    var (cumN, cumPos) = (0L, 0L)
    val totPos = users.map(_._2).sum
    got.foreach { r =>
      val g = byDec(r.getLong(0))
      cumN += g.size; cumPos += g.map(_._2).sum
      assert(r.getLong(1) == g.size.toLong && r.getLong(2) == g.map(_._2).sum)
      assert(r.getLong(3) == cumN && r.getLong(4) == cumPos)
      assert(r.getLong(5) == cumPos * n && r.getLong(6) == cumN * totPos)
    }
    assert(cumN == n && cumPos == totPos) // the table covers everyone
  }

  test("qm7 audio features match the sample formula; header fields parse") {
    val ids = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 7 == 0)

    val got = SparkEntry.queries("qm7_audioenergy")(spark, TestSpark.Sf).collect()
    assert(got.length == ids.length * 4)
    got.foreach { r =>
      val id = r.getLong(0)
      val samples = (0 until 64).map(i =>
        ((id * 131 + i * 17) % 65536) - 32768)
      assert(r.getLong(1) == 1L) // RIFF + WAVE magic parsed from bytes
      assert(r.getLong(2) == 16000L && r.getLong(3) == 1L)
      assert(r.getLong(4) == 16L && r.getLong(5) == 64L)
      val f = r.getLong(6).toInt
      val frame = samples.slice(f * 16, f * 16 + 16)
      assert(r.getLong(7) == frame.map(s => s * s).sum)
      val zc = (0 until 15).count(i => frame(i) * frame(i + 1) < 0)
      assert(r.getLong(8) == zc.toLong)
    }
  }
}
