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

    // a predicate the condition language cannot express must FAIL the
    // statement, never delete the wrong rows
    val e = intercept[Exception] {
      spark.sql("DELETE FROM snapt.db.t WHERE v * 2 > 3")
    }
    assert(e.getMessage.toLowerCase.contains("delete"),
      s"untranslatable DELETE predicate must fail loudly: ${e.getMessage}")
    assert(spark.sql("SELECT COUNT(*) FROM snapt.db.t").head().getLong(0)
      == 150L, "the refused DELETE must not have changed the table")

    // DROP removes the directory; the identifier stops resolving
    spark.sql("DROP TABLE snapt.db.t")
    assert(SnapTable.latestVersion(spark, tableDir) == 0)
    assert(!spark.sql("SHOW TABLES IN snapt.db").collect()
      .exists(_.getString(1) == "t"))
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
