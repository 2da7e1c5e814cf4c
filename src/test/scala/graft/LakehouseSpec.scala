package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lakehouse

/** Partition-scoped MERGE (operators/Lakehouse.mergeInto): upsert
  * semantics, sibling-partition physical integrity, and idempotency. */
class LakehouseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "target/graft-merge-spec"

  /** data files under a partition dir → (relative name, size, mtime) */
  private def files(part: String): Set[(String, Long, Long)] = {
    val root = Paths.get(dir, s"o_orderpriority=$part")
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.startsWith("part-"))
      .map(p => (root.relativize(p).toString, Files.size(p),
        Files.getLastModifiedTime(p).toMillis))
      .toSet
  }

  private def layOut() = {
    val orders = Tables(spark, TestSpark.Sf, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(dir)
    orders
  }

  private def batchOf(orders: org.apache.spark.sql.DataFrame) = {
    val touched = col("o_orderpriority") <= "2-HIGH"
    orders.filter(touched && col("o_orderkey") % 100 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000)
      .unionByName(
        orders.filter(touched && col("o_orderkey") % 100 === 1)
          .withColumn("o_orderkey", col("o_orderkey") + 100000000L)
          .withColumn("o_totalprice", col("o_totalprice") + 7))
  }

  test("merge rewrites only the touched partitions") {
    val orders = layOut()
    val before = Map("3-MEDIUM" -> files("3-MEDIUM"),
      "5-LOW" -> files("5-LOW"), "1-URGENT" -> files("1-URGENT"))
    val affected = Lakehouse.mergeInto(
      spark, dir, "o_orderpriority", Seq("o_orderkey"), batchOf(orders))
    assert(affected == Seq("1-URGENT", "2-HIGH"))
    // untouched siblings: identical file sets, sizes, and mtimes
    assert(files("3-MEDIUM") == before("3-MEDIUM"))
    assert(files("5-LOW") == before("5-LOW"))
    // touched partition: physically rewritten
    assert(files("1-URGENT") != before("1-URGENT"))
  }

  test("merged state == anti-join ∪ batch, and merge is idempotent") {
    val orders = layOut()
    val batch = batchOf(orders)
    Lakehouse.mergeInto(spark, dir, "o_orderpriority", Seq("o_orderkey"), batch)
    val expected = orders.join(batch, Seq("o_orderkey"), "left_anti")
      .unionByName(batch)
      .orderBy("o_orderkey").collect().toSeq
    def state() = spark.read.parquet(dir)
      .select(orders.columns.map(col): _*)
      .orderBy("o_orderkey").collect().toSeq
    assert(state() == expected)
    // re-applying the same batch replaces rows with identical content
    Lakehouse.mergeInto(spark, dir, "o_orderpriority", Seq("o_orderkey"), batch)
    assert(state() == expected)
  }
}
