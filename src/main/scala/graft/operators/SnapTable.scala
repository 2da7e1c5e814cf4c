package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-manifest table format over plain parquet — the minimal
  * lakehouse commit protocol (the Iceberg/Delta core, derived from the
  * public designs, with none of the dependencies):
  *
  *   dir/data/<commit-id>/part-*.parquet   immutable data files
  *   dir/_manifests/v<N>.txt               immutable file list, one/commit
  *   dir/_latest                           current-version pointer
  *
  * Invariants the spec pins:
  *   - a snapshot is the EXACT file list in its manifest — readers never
  *     list the data directory, so files from in-flight, failed, or
  *     foreign writes (orphans) are invisible until a manifest names
  *     them;
  *   - manifests are immutable once written: committing version N+1
  *     never touches version N's manifest or files, so every historical
  *     version stays readable (time travel) and long-running readers of
  *     version N are isolated from concurrent commits;
  *   - the pointer swap is a write-temp + atomic-rename, so a reader
  *     sees the old version or the new one, never a torn state: commit
  *     order is data files → manifest → pointer, and a crash before the
  *     pointer swap leaves only invisible orphans.
  *
  * At 100 TB the same protocol holds with manifests listing O(files)
  * names — metadata, scanned at planning time; the data path is ordinary
  * distributed parquet scans of the named files.
  */
object SnapTable {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Int) = new Path(s"$dir/_manifests/v$v.txt")
  private def latestPath(dir: String) = new Path(s"$dir/_latest")

  private def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def writeAtomic(f: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p)) throw new java.io.IOException(s"rename $tmp -> $p failed")
  }

  /** Latest committed version, 0 if the table has none. */
  def latestVersion(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    if (f.exists(latestPath(dir))) readSmall(f, latestPath(dir)).trim.toInt else 0
  }

  /** Commit `df` as the next version. `append = true` carries the
    * previous snapshot's files forward; `false` makes `df` the entire
    * new table state (files of older versions remain on disk and remain
    * readable through their manifests). Returns the new version. */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
             append: Boolean = false): Int = {
    val f = fs(spark, dir)
    val prev = latestVersion(spark, dir)
    val v = prev + 1
    val commitId = f"c$v%05d-" + java.util.UUID.randomUUID().toString.take(8)
    val genDir = s"$dir/data/$commitId"
    df.write.parquet(genDir)
    val newFiles = f.listStatus(new Path(genDir)).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .map(p => s"data/$commitId/${p.getName}")
      .sorted
    val carried =
      if (append && prev > 0)
        readSmall(f, manifestPath(dir, prev)).split("\n").toSeq.filter(_.nonEmpty)
      else Nil
    writeAtomic(f, manifestPath(dir, v), (carried ++ newFiles).mkString("\n"))
    writeAtomic(f, latestPath(dir), v.toString)
    v
  }

  /** Read a snapshot (default: latest). The scan is exactly the
    * manifest's file list — never a directory listing. */
  def read(spark: SparkSession, dir: String, version: Int = 0): DataFrame = {
    val f = fs(spark, dir)
    val v = if (version > 0) version else latestVersion(spark, dir)
    require(v > 0, s"no committed version at $dir")
    val files = readSmall(f, manifestPath(dir, v)).split("\n")
      .filter(_.nonEmpty).map(rel => s"$dir/$rel").toSeq
    spark.read.parquet(files: _*)
  }

  /** Drop the whole table (test/fixture hygiene). */
  def destroy(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    f.delete(new Path(dir), true)
  }
}
