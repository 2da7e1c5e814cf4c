package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapTable

/** The snap TableCatalog (sources/SnapCatalog): CREATE / INSERT /
  * SELECT / DELETE / DROP through plain SQL against catalog
  * identifiers — no OPTIONS plumbing. DELETE is the round-13 SQL
  * surface over the file-granular copy-on-write delete; the spec pins
  * that untouched files carry VERBATIM (no table rewrite), history
  * stays readable, and untranslatable predicates fail loudly. */
class SnapCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.snapt",
      classOf[graft.sources.SnapCatalog].getName)
    s.conf.set("spark.sql.catalog.snapt.warehouse", "target/snap-warehouse")
    s
  }
  private val tableDir = "target/snap-warehouse/db/t"

  test("catalog lifecycle: CREATE, INSERT, SELECT, DELETE, DROP") {
    SnapTable.destroy(spark, tableDir)
    spark.sql("""CREATE TABLE snapt.db.t (id BIGINT, grp BIGINT, v DOUBLE)
                 USING `graft-snap` TBLPROPERTIES ('statCols' = 'grp')""")
    // creation committed version 1: schema pin + stat declaration exist
    // before any data lands
    assert(SnapTable.latestVersion(spark, tableDir) == 1)
    assert(SnapTable.header(spark, tableDir).statCols == Seq("grp"))
    assert(spark.sql("SELECT * FROM snapt.db.t").count() == 0)
    // SHOW TABLES sees it
    assert(spark.sql("SHOW TABLES IN snapt.db").collect()
      .exists(_.getString(1) == "t"))
    // INSERT INTO = an append commit; the range layout separates grp
    // values into distinct files so the DELETE below genuinely prunes
    spark.sql("""INSERT INTO snapt.db.t
                 SELECT /*+ REPARTITION_BY_RANGE(4, grp) */
                   id, id % 4 AS grp, CAST(id AS DOUBLE) / 10 AS v
                 FROM range(200)""")
    assert(SnapTable.latestVersion(spark, tableDir) == 2)
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t").head().getLong(0)
      == 200L)
    val filesBefore = SnapTable.files(spark, tableDir, 2).toSet

    // SQL DELETE: file-granular COW through the catalog
    spark.sql("DELETE FROM snapt.db.t WHERE grp = 2")
    assert(SnapTable.latestVersion(spark, tableDir) == 3)
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t").head().getLong(0)
      == 150L)
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t WHERE grp = 2")
      .head().getLong(0) == 0L)
    // untouched files carried VERBATIM — the zone hint bounded the
    // rewrite to candidate files only
    val filesAfter = SnapTable.files(spark, tableDir, 3).toSet
    val carried = filesBefore.intersect(filesAfter)
    assert(carried.nonEmpty,
      "DELETE rewrote every file — the zone hint did not prune")
    assert(filesBefore.diff(filesAfter).nonEmpty,
      "DELETE rewrote nothing — no candidate file was touched")
    // history: the pre-delete version still reads complete
    assert(SnapTable.read(spark, tableDir, 2).count() == 200L)

    // a predicate the metadata-delete language cannot express routes to
    // the GROUP-BASED row-level path (round 13) instead of failing:
    // Spark rewrites it over the _file-bearing scan and this executes
    // as a copy-on-write ReplaceData — correct rows, new version
    val before = spark.sql("SELECT COUNT(*) FROM snapt.db.t")
      .head().getLong(0)
    val expectDel = spark.sql(
      "SELECT COUNT(*) FROM snapt.db.t WHERE v * 10 > 150").head().getLong(0)
    assert(expectDel > 0 && expectDel < before, "fixture vacuous")
    spark.sql("DELETE FROM snapt.db.t WHERE v * 10 > 150")
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t").head().getLong(0)
      == before - expectDel,
      "the computed-predicate DELETE must execute via the row-level path")

    // DROP removes the directory; the identifier stops resolving
    spark.sql("DROP TABLE snapt.db.t")
    assert(SnapTable.latestVersion(spark, tableDir) == 0)
    assert(!spark.sql("SHOW TABLES IN snapt.db").collect()
      .exists(_.getString(1) == "t"))
  }

  test("SQL UPDATE and MERGE: group-based copy-on-write, matched files only") {
    // round 13 (SupportsRowLevelOperations): the analyzer rewrites
    // UPDATE/MERGE over the operation's _file-bearing scan, the group
    // filter narrows the rewrite to files holding matched rows, and
    // the commit swaps exactly those files — untouched files carry
    // verbatim, history stays readable.
    SnapTable.destroy(spark, tableDir)
    spark.sql("""CREATE TABLE snapt.db.t (id BIGINT, grp BIGINT, v DOUBLE)
                 USING `graft-snap` TBLPROPERTIES ('statCols' = 'grp')""")
    spark.sql("""INSERT INTO snapt.db.t
                 SELECT /*+ REPARTITION_BY_RANGE(4, grp) */
                   id, id % 4 AS grp, CAST(id AS DOUBLE) AS v
                 FROM range(200)""")
    val filesBefore = SnapTable.files(spark, tableDir, 2).toSet

    // UPDATE: only grp=1 rows change; only their files rewrite
    spark.sql("UPDATE snapt.db.t SET v = v + 1000 WHERE grp = 1")
    assert(SnapTable.latestVersion(spark, tableDir) == 3)
    assert(spark.sql(
      "SELECT COUNT(*) FROM snapt.db.t WHERE grp = 1 AND v >= 1000")
      .head().getLong(0) == 50L)
    assert(spark.sql(
      "SELECT COUNT(*) FROM snapt.db.t WHERE grp <> 2 AND v >= 1000 AND grp <> 1")
      .head().getLong(0) == 0L, "UPDATE leaked into unmatched rows")
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t").head().getLong(0)
      == 200L)
    val filesAfterUpd = SnapTable.files(spark, tableDir, 3).toSet
    assert(filesBefore.intersect(filesAfterUpd).nonEmpty,
      "UPDATE rewrote every file — group filtering did not narrow it")
    assert(SnapTable.meta(spark, tableDir, 3)("rowLevelOp") == "UPDATE")
    // history: pre-update version unchanged
    assert(spark.sql(
      "SELECT COUNT(*) FROM snapt.db.t VERSION AS OF 2 WHERE v >= 1000")
      .head().getLong(0) == 0L)

    // MERGE: matched rows update, unmatched source rows insert
    spark.range(190, 210)
      .selectExpr("id", "id % 4 AS grp", "CAST(-1 AS DOUBLE) AS v")
      .createOrReplaceTempView("merge_src")
    spark.sql("""MERGE INTO snapt.db.t t USING merge_src s ON t.id = s.id
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT (id, grp, v)
                   VALUES (s.id, s.grp, s.v)""")
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t").head().getLong(0)
      == 210L, "MERGE must insert the 10 unmatched source rows")
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t WHERE v = -1")
      .head().getLong(0) == 20L,
      "MERGE must update matched and insert unmatched")
    assert(SnapTable.meta(spark, tableDir)("rowLevelOp") == "MERGE")
    // exactness of the whole table against a recompute
    val got = spark.sql("SELECT id, grp, v FROM snapt.db.t ORDER BY id")
      .collect().map(_.toSeq.mkString("|")).toSeq
    val want = spark.sql(
      """SELECT id, id % 4 AS grp,
           CASE WHEN id >= 190 THEN CAST(-1 AS DOUBLE)
                WHEN id % 4 = 1 THEN CAST(id AS DOUBLE) + 1000
                ELSE CAST(id AS DOUBLE) END AS v
         FROM range(210) ORDER BY id""")
      .collect().map(_.toSeq.mkString("|")).toSeq
    assert(got === want, "MERGE end state diverged from the recompute")
    spark.sql("DROP TABLE snapt.db.t")
  }

  test("SQL time travel, INSERT OVERWRITE, and streaming toTable") {
    import org.apache.spark.sql.streaming.Trigger
    SnapTable.destroy(spark, tableDir)
    spark.sql("""CREATE TABLE snapt.db.t (id BIGINT, v DOUBLE)
                 USING `graft-snap`""")
    spark.sql("""INSERT INTO snapt.db.t
                 SELECT id, CAST(id AS DOUBLE) FROM range(50)""")
    spark.sql("""INSERT INTO snapt.db.t
                 SELECT id, CAST(id AS DOUBLE) FROM range(50, 80)""")
    // VERSION AS OF reaches each committed snapshot through plain SQL
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t VERSION AS OF 2")
      .head().getLong(0) == 50L)
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t VERSION AS OF 3")
      .head().getLong(0) == 80L)
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t").head().getLong(0)
      == 80L)
    // INSERT OVERWRITE = a replace commit; history stays readable
    spark.sql("""INSERT OVERWRITE snapt.db.t
                 SELECT id, CAST(id AS DOUBLE) FROM range(7)""")
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t").head().getLong(0)
      == 7L)
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t VERSION AS OF 3")
      .head().getLong(0) == 80L,
      "history must survive INSERT OVERWRITE")
    // streaming toTable resolves the catalog table onto the native sink
    val tmp = java.nio.file.Files.createTempDirectory("snapt-stream").toString
    spark.range(100, 110)
      .select(col("id"), col("id").cast("double").as("v"))
      .write.parquet(s"$tmp/in")
    val q = spark.readStream
      .schema("id BIGINT, v DOUBLE").parquet(s"$tmp/in")
      .writeStream.option("checkpointLocation", s"$tmp/cp")
      .trigger(Trigger.AvailableNow()).toTable("snapt.db.t")
    q.awaitTermination()
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t").head().getLong(0)
      == 17L, "streamed micro-batch must append to the catalog table")
    assert(SnapTable.meta(spark, tableDir).contains("streamEpoch"),
      "the streamed commit must carry the exactly-once marker")
    spark.sql("DROP TABLE snapt.db.t")
  }

  test("catalog guard rails: ALTER refused, CREATE over existing refused") {
    SnapTable.destroy(spark, tableDir)
    spark.sql("CREATE TABLE snapt.db.t (id BIGINT) USING `graft-snap`")
    intercept[Exception] {
      spark.sql("CREATE TABLE snapt.db.t (id BIGINT) USING `graft-snap`")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE snapt.db.t ADD COLUMN x BIGINT")
    }
    spark.sql("DROP TABLE snapt.db.t")
  }
}
