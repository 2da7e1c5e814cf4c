package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.NdjsonScan

/** DataSource V2 NDJSON connector (sources/GraftNdjson): built-in-reader
  * equality, pushdown placement, null semantics of pushed comparisons,
  * subtree-as-string capture, and split-size invariance of the
  * line-aligned byte-split protocol. */
class NdjsonSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val file = "src/test/resources/geo/house_numbers.ndjson"

  private val scalarSchema = StructType(Seq(
    StructField("id", StringType), StructField("type", StringType),
    StructField("validSince", StringType), StructField("validUntil", StringType)))

  private val fullSchema = scalarSchema
    .add(StructField("data", StringType))
    .add(StructField("geometry", StringType))

  private def viaSource(schema: StructType, extra: (String, String)*): DataFrame = {
    val r = spark.read.format("graft-ndjson").schema(schema)
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load(file)
  }

  private def viaBuiltin(schema: StructType): DataFrame =
    spark.read.schema(schema).json(file)

  test("scalar columns equal the built-in json reader") {
    val a = viaSource(scalarSchema).orderBy("id").collect().toSeq
    val b = viaBuiltin(scalarSchema).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("nested subtrees arrive as JSON strings composable downstream") {
    val src = viaSource(fullSchema)
      .select(col("id"), get_json_object(col("data"), "$.borough").as("b"))
      .orderBy("id").collect().toSeq
    val ref = spark.read.schema(StructType(Seq(
        StructField("id", StringType),
        StructField("data", StructType(Seq(StructField("borough", StringType)))))))
      .json(file)
      .select(col("id"), col("data.borough").as("b"))
      .orderBy("id").collect().toSeq
    assert(src == ref)
  }

  private def batchScan(df: DataFrame): NdjsonScan = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[BatchScanExec] = p match {
      case b: BatchScanExec         => Seq(b)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case other                    => other.children.flatMap(scans)
    }
    val found = scans(df.queryExecution.executedPlan)
    assert(found.nonEmpty, df.queryExecution.executedPlan.toString)
    found.head.scan.asInstanceOf[NdjsonScan]
  }

  test("supported predicates push into the parser; others stay post-scan") {
    val df = viaSource(scalarSchema)
      .filter(col("type") === "st:Address" && col("validSince") >= "1880" &&
        length(col("id")) === 4)
    val pushed = batchScan(df).pushedFilters.map(_.toString).mkString(";")
    assert(pushed.contains("type") && pushed.contains("validSince"), pushed)
    assert(!pushed.toLowerCase.contains("length"), pushed)
    // and the combination still computes the right answer
    val n = df.count()
    val ref = viaBuiltin(scalarSchema)
      .filter(col("type") === "st:Address" && col("validSince") >= "1880" &&
        length(col("id")) === 4).count()
    assert(n == ref)
  }

  test("pushed comparison on a missing field follows SQL null semantics") {
    val src = viaSource(scalarSchema)
      .filter(col("validSince") >= "1880").count()
    val ref = viaBuiltin(scalarSchema)
      .filter(col("validSince") >= "1880").count()
    assert(src == ref)
    // missing-key rows exist in the fixture and are excluded
    val withMissing = viaBuiltin(scalarSchema)
      .filter(col("validSince").isNull).count()
    assert(withMissing > 0)
  }

  test("write path round-trips scalars and raw JSON subtrees") {
    val dir = "target/graft-ndjson-write-spec"
    val src = Tables(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"),
        to_json(struct(col("source"), col("n_chars"))).as("props"))
    src.write.format("graft-ndjson").mode("overwrite")
      .option("jsonColumns", "props").save(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("props", StringType)))
    val back = spark.read.format("graft-ndjson").schema(schema).load(dir)
      .select(col("doc_id"), col("text"), col("lang"),
        get_json_object(col("props"), "$.source").as("source"),
        get_json_object(col("props"), "$.n_chars").cast(LongType).as("n_chars"))
      .orderBy("doc_id").collect().toSeq
    val expect = Tables(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id").collect().toSeq
    assert(back == expect)
    // job commit left no temp state behind
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_temporary")))
    // raw embedding produced natural nested NDJSON, not quoted strings
    val firstLine = scala.io.Source.fromFile(
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".ndjson")).minBy(_.getName)).getLines().next()
    assert(firstLine.contains("\"props\":{"), firstLine)
  }

  test("overwrite mode truncates; append mode accumulates") {
    val dir = "target/graft-ndjson-mode-spec"
    val rows = viaSource(scalarSchema).limit(10).select("id", "type")
    val s2 = StructType(Seq(
      StructField("id", StringType), StructField("type", StringType)))
    rows.write.format("graft-ndjson").mode("overwrite").save(dir)
    rows.write.format("graft-ndjson").mode("append").save(dir)
    assert(spark.read.format("graft-ndjson").schema(s2).load(dir).count() == 20)
    rows.write.format("graft-ndjson").mode("overwrite").save(dir)
    assert(spark.read.format("graft-ndjson").schema(s2).load(dir).count() == 10)
  }

  test("micro-batch streaming read: new files per trigger, checkpointed restart") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndjson-stream")
    val (inDir, cp, out) = (s"$tmp/in", s"$tmp/cp", s"$tmp/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    def stage(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(inDir, name),
        lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    def run(): Unit = {
      val q = spark.readStream.format("graft-ndjson").schema(scalarSchema)
        .load(inDir)
        .filter(col("type") === "st:Address") // pushdown rides streaming too
        .select("id")
        .writeStream.format("parquet")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", cp)
        .option("path", out).start()
      q.awaitTermination()
    }
    def ids(): Seq[String] = spark.read.parquet(out)
      .collect().map(_.getString(0)).sorted.toSeq
    stage("part-00000.ndjson", Seq(
      """{"id":"a1","type":"st:Address","validSince":"1880"}""",
      """{"id":"x1","type":"st:Street","validSince":"1880"}"""))
    run()
    assert(ids() == Seq("a1")) // filter pushed, street row dropped
    // restart with a new file: old file skipped via the offset log
    stage("part-00001.ndjson", Seq(
      """{"id":"a2","type":"st:Address","validSince":"1890"}"""))
    run()
    assert(ids() == Seq("a1", "a2"))
  }

  test("admission control: maxFilesPerTrigger bounds each micro-batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndjson-adm")
    val inDir = s"$tmp/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    (0 to 2).foreach { i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(inDir, f"part-$i%05d.ndjson"),
        s"""{"id":"a$i","type":"st:Address","validSince":"1880"}\n""".getBytes("UTF-8"))
    }
    def batchSizes(opts: Map[String, String]): Seq[Long] = {
      val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
      val reader = spark.readStream.format("graft-ndjson").schema(scalarSchema)
      val q = opts.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
        .load(inDir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          sizes.synchronized { sizes += b.count() }; ()
        }
        .option("checkpointLocation", s"$tmp/cp-${opts.hashCode}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      sizes.toSeq
    }
    // rate-limited: one file (= one row) per micro-batch, three batches
    assert(batchSizes(Map("maxFilesPerTrigger" -> "1")) == Seq(1L, 1L, 1L))
    // unlimited: the catch-up burst lands as one batch
    assert(batchSizes(Map.empty) == Seq(3L))
  }

  test("COUNT/MIN/MAX push into the source; partials merge exactly") {
    // pure count: pushed (and served by newline counting, no parse)
    val c = viaSource(scalarSchema, "splitBytes" -> "4096")
    assert(batchScan(c.groupBy().count()).pushedAggs
      .contains(graft.sources.NdjsonCountStar))
    assert(c.count() == viaBuiltin(scalarSchema).count())
    // min/max under a pushed filter, many splits
    val agg = viaSource(scalarSchema, "splitBytes" -> "4096")
      .filter(col("type") === "st:Address")
      .agg(min("id").as("lo"), max("validSince").as("hi"),
        count(lit(1)).as("n"))
    assert(batchScan(agg).pushedAggs.size == 3)
    val got = agg.collect().head
    val ref = viaBuiltin(scalarSchema)
      .filter(col("type") === "st:Address")
      .agg(min("id"), max("validSince"), count(lit(1))).collect().head
    assert(got.toSeq == ref.toSeq)
    // avg is not pushable: falls back to row reads, still exact
    val av = viaSource(scalarSchema)
      .agg(avg(length(col("id"))).as("a"))
    assert(batchScan(av).pushedAggs.isEmpty)
    assert(av.collect().head.getDouble(0) ==
      viaBuiltin(scalarSchema).agg(avg(length(col("id")))).collect().head.getDouble(0))
    // an OUTER aggregate over a pushed-agg result prunes the inner
    // aggregate list to EMPTY — the builder must decline that push or
    // the scan's column count breaks ("data source returns unexpected
    // number of columns", round-12 regression via q158's smoke count)
    assert(agg.count() == 1L)
  }

  test("reported statistics let Catalyst broadcast the small NDJSON side") {
    val big = spark.range(200000)
      .selectExpr("concat('h', lpad(cast(id % 500 as string), 3, '0')) AS id",
        "id AS n")
    val joined = big.join(viaSource(scalarSchema), Seq("id"))
      .groupBy("type").count()
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"DSv2 side not broadcast (stats missing?):\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("permissive mode quarantines malformed lines; strict mode throws") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ndjson-bad")
    val f = s"$tmp/mixed.ndjson"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
      """{"id":"a1","type":"st:Address"}
        |this is not json {{{
        |{"id":"a2","type":"st:Street"}
        |""".stripMargin)
    val schema = scalarSchema.add(StructField("_corrupt_record", StringType))
    val rows = spark.read.format("graft-ndjson").schema(schema)
      .option("mode", "permissive").load(f)
      .select("id", "_corrupt_record").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sortBy(t => (t._1 == null, t._1))
    assert(rows == Seq(("a1", null), ("a2", null), (null, "this is not json {{{")))
    // pushed filter on a data field drops quarantine rows by null
    // semantics — same verdict a post-scan filter reaches
    val filtered = spark.read.format("graft-ndjson").schema(schema)
      .option("mode", "permissive").load(f)
      .filter(col("type") === "st:Address").collect()
    assert(filtered.map(_.getString(0)).toSeq == Seq("a1"))
    // strict (default) mode fails loudly instead
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-ndjson").schema(scalarSchema).load(f).collect()
    }
    assert(ex.getMessage.contains("malformed") ||
      Option(ex.getCause).exists(_.getMessage.contains("malformed")))
  }

  test("tiny splits read the same rows as one split (line alignment)") {
    val one = viaSource(scalarSchema).select("id").collect()
      .map(_.getString(0)).sorted.toSeq
    val many = viaSource(scalarSchema, "splitBytes" -> "512").select("id")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(many.size == one.size)
    assert(many == one)
  }

  test("every file open rides the broadcast SESSION Hadoop conf") {
    // the round-11 finding: executor-side `new Configuration()` drops
    // spark.hadoop.* (cloud-FS credentials, scheme mappings) — invisible
    // on local FS, wrong on any real cluster. Source pin (the
    // SnapTableSpec region-pin pattern): no bare Configuration
    // construction anywhere in the connector; every FileSystem access
    // goes through GraftBridge's broadcast/session conf.
    for (f <- Seq("src/main/scala/graft/sources/GraftNdjson.scala",
                  "src/main/scala/graft/sources/GraftNdjsonWrite.scala")) {
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)), "UTF-8")
      val code = src.linesIterator // strip comment lines before matching
        .filterNot(l => l.trim.startsWith("//") || l.trim.startsWith("*"))
        .mkString("\n")
      assert(!code.contains("new Configuration()"),
        s"bare `new Configuration()` reappeared in $f")
      assert(code.contains("GraftBridge.hadoopConf"),
        s"$f no longer routes file opens through the broadcast conf")
    }

    // behavioural half: a RUNTIME session override (spark.conf.set of
    // an fs.* key — the per-session cloud-credential mechanism; session
    // confs fold into newHadoopConf verbatim, unlike startup-only
    // spark.hadoop.* prefix stripping) must be visible through the
    // broadcast the connector ships; sc.hadoopConfiguration never sees it
    spark.conf.set("fs.graft.test.probe", "rode-the-broadcast")
    try {
      assert(spark.sparkContext.hadoopConfiguration
        .get("fs.graft.test.probe") == null,
        "probe leaked into the context conf — the test is vacuous")
      val b = org.apache.spark.sql.GraftBridge.hadoopConfBroadcast(spark)
      assert(org.apache.spark.sql.GraftBridge.hadoopConf(b)
        .get("fs.graft.test.probe") == "rode-the-broadcast",
        "hadoopConfBroadcast dropped a session-level fs.* override")
      assert(org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark)
        .get("fs.graft.test.probe") == "rode-the-broadcast")
    } finally spark.conf.unset("fs.graft.test.probe")
  }
}
