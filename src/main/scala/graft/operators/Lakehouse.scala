package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lakehouse mutation verbs over plain parquet layouts — the table
  * maintenance a 100 TB corpus needs between full rebuilds.
  *
  * `mergeInto` is MERGE/upsert as partition-scoped copy-on-write:
  * updates and inserts land by rewriting ONLY the partitions they touch
  * (O(affected partitions) data moved, a metadata swap for the rest),
  * never a full-table pass. The protocol:
  *
  *   1. the update batch's distinct partition values are collected —
  *      partition METADATA, bounded by partition count, never data rows;
  *   2. current rows of those partitions join the batch with a LEFT ANTI
  *      on the merge key (rows being replaced drop out), then the batch
  *      unions in — upsert semantics: matched keys take the batch row,
  *      unmatched batch rows insert;
  *   3. the merged slice stages to a scratch generation dir first —
  *      Spark (correctly) refuses to overwrite a path an active plan is
  *      reading, and at scale the stage+swap is also the crash-safety
  *      story: a failed merge leaves the live table untouched;
  *   4. the staged slice reads back and dynamic-partition-overwrite
  *      lands exactly the affected partitions (sibling partitions' files
  *      are never listed, read, or rewritten — q58's spec pins their
  *      files byte-identical by mtime+length).
  *
  * The update batch may touch any number of partitions; each batch row
  * must carry the full row schema (partition column included — a row
  * whose key moves partitions lands in its NEW partition; the old copy
  * drops only if the old partition is also touched by the batch, the
  * declared same-partition-key contract of partition-scoped merge).
  */
object Lakehouse {

  /** Upsert `batch` into the partitioned parquet table at `dir`.
    * `partCol` is the table's partition column, `keyCols` the merge key.
    * Returns the affected partition values (diagnostic, bounded). */
  def mergeInto(spark: SparkSession, dir: String, partCol: String,
                keyCols: Seq[String], batch: DataFrame): Seq[String] = {
    val affected = batch.select(col(partCol).cast("string"))
      .distinct().collect().map(_.getString(0)).toSeq.sorted
    val current = spark.read.parquet(dir)
      .filter(col(partCol).cast("string").isin(affected: _*))
    val merged = current
      .join(batch, keyCols, "left_anti")
      .unionByName(batch)
    val staging = dir + ".staging"
    merged.write.mode("overwrite").partitionBy(partCol).parquet(staging)
    spark.read.parquet(staging)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(dir)
    affected
  }
}
