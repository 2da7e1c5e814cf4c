package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * MANIFEST STATS (zone maps): a commit may declare LONG stat columns;
  * each new file's min/max per column is computed in one aggregate over
  * the just-written files and recorded on its manifest line. `readWhere`
  * then prunes files whose [min,max] cannot intersect a range predicate
  * AT PLANNING TIME — metadata-only work, before any data file opens.
  * At 100 TB this is the difference between "scan the corpus" and "open
  * the 3 files that can match": the same mechanism as Iceberg manifest
  * pruning / parquet row-group skipping, one level up, with O(files)
  * metadata. The residual predicate still applies to survivors, so
  * pruning is a pure optimization and can never change results.
  *
  * Manifest line format:  relPath[\tmin,max[,min,max...]]
  * with a `#stats:` header naming the stat columns. Files with all-null
  * stat values record `-,-` and are never pruned.
  */
object SnapTable {

  final case class ScanPlan(df: DataFrame, filesScanned: Int, filesTotal: Int)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(dir: String, v: Int) = new Path(s"$dir/_manifests/v$v.txt")
  private def latestPath(dir: String) = new Path(s"$dir/_latest")

  private def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** A concurrent commit raced this one to the version slot. */
  final class CommitConflictException(v: Int)
    extends RuntimeException(s"version $v was committed concurrently; " +
      "re-read the table and retry")

  private def writeAtomic(f: FileSystem, p: Path, content: String,
                          overwrite: Boolean = true): Unit = {
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    if (overwrite && f.exists(p)) f.delete(p, false)
    // with overwrite=false this is the commit CAS: HDFS/posix rename onto
    // an existing path fails, so exactly one of two racing committers
    // claims the version slot — optimistic concurrency with no lock
    // service (losers throw CommitConflictException and retry on a
    // re-read table)
    if (!f.rename(tmp, p)) {
      f.delete(tmp, false)
      throw new java.io.IOException(s"rename $tmp -> $p failed")
    }
  }

  /** Latest committed version, 0 if the table has none. */
  def latestVersion(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    if (f.exists(latestPath(dir))) readSmall(f, latestPath(dir)).trim.toInt else 0
  }

  private def manifestLines(f: FileSystem, dir: String, v: Int): Seq[String] =
    readSmall(f, manifestPath(dir, v)).split("\n").toSeq.filter(_.nonEmpty)

  /** Commit `df` as the next version. `append = true` carries the
    * previous snapshot's files forward; `false` makes `df` the entire
    * new table state (files of older versions remain on disk and remain
    * readable through their manifests). `statCols` declares LONG columns
    * whose per-file min/max land in the manifest for `readWhere`
    * pruning; an append must declare the same columns as the manifest
    * it extends. Returns the new version. */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
             append: Boolean = false, statCols: Seq[String] = Nil,
             meta: Map[String, String] = Map.empty): Int = {
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
    // per-file zone maps: ONE aggregate over the just-written files
    val statsByName: Map[String, String] =
      if (statCols.isEmpty) Map.empty
      else {
        val aggs = statCols.flatMap(c =>
          Seq(min(col(c).cast("long")).as(s"_min_$c"),
            max(col(c).cast("long")).as(s"_max_$c")))
        spark.read.parquet(genDir)
          .groupBy(input_file_name().as("_f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val name = r.getString(0).split("/").last
            val cells = statCols.flatMap { c =>
              val i = r.fieldIndex(s"_min_$c")
              val j = r.fieldIndex(s"_max_$c")
              if (r.isNullAt(i) || r.isNullAt(j)) Seq("-", "-")
              else Seq(r.getLong(i).toString, r.getLong(j).toString)
            }
            name -> cells.mkString(",")
          }.toMap
      }
    val header =
      (if (statCols.nonEmpty) Seq(s"#stats:${statCols.mkString(",")}") else Nil) ++
        meta.toSeq.sortBy(_._1).map { case (k, vl) => s"#meta:$k=$vl" }
    val newLines = newFiles.map { rel =>
      statsByName.get(rel.split("/").last) match {
        case Some(cells) => s"$rel\t$cells"
        case None        => rel
      }
    }
    val carried =
      if (append && prev > 0) {
        val prevLines = manifestLines(f, dir, prev)
        val prevHeader = prevLines.find(_.startsWith("#stats:"))
        require(prevHeader.forall(h => h == s"#stats:${statCols.mkString(",")}"),
          s"append stat columns must match the extended manifest ($prevHeader)")
        prevLines.filterNot(_.startsWith("#"))
      } else Nil
    val manifest = manifestPath(dir, v)
    if (f.exists(manifest)) throw new CommitConflictException(v)
    try writeAtomic(f, manifest,
      (header ++ carried ++ newLines).mkString("\n"), overwrite = false)
    catch {
      case _: java.io.IOException => throw new CommitConflictException(v)
    }
    writeAtomic(f, latestPath(dir), v.toString)
    v
  }

  /** VACUUM: physically delete data files no retained manifest
    * references. `retainLast` manifests (ending at the current version)
    * survive; older manifests are dropped too, so time travel is
    * explicitly bounded by retention — the declared trade for
    * reclaiming overwritten/compacted storage. Orphans of in-flight
    * commits are left alone (they may belong to a commit racing this
    * vacuum); a failed commit's orphans get collected once its version
    * slot is claimed by a later commit and ages out of retention.
    * Returns the number of data files deleted. */
  def vacuum(spark: SparkSession, dir: String, retainLast: Int = 2): Int = {
    require(retainLast >= 1, "must retain at least the current version")
    val f = fs(spark, dir)
    val v = latestVersion(spark, dir)
    require(v > 0, s"no committed version at $dir")
    val keep = (math.max(1, v - retainLast + 1) to v).toSet
    val referenced: Set[String] = keep.flatMap { kv =>
      entries(f, dir, kv)._2.map(_._1)
    }
    val dataRoot = new Path(s"$dir/data")
    var deleted = 0
    if (f.exists(dataRoot)) {
      // only files that SOME retained-or-dropped manifest ever named are
      // candidates — unreferenced orphans may be an in-flight commit
      val everNamed: Set[String] = (1 to v).toSet[Int].flatMap { kv =>
        if (f.exists(manifestPath(dir, kv))) entries(f, dir, kv)._2.map(_._1)
        else Set.empty[String]
      }
      (everNamed -- referenced).foreach { rel =>
        val p = new Path(s"$dir/$rel")
        if (f.exists(p) && f.delete(p, false)) deleted += 1
      }
    }
    (1 until keep.min).foreach { kv =>
      f.delete(manifestPath(dir, kv), false); ()
    }
    deleted
  }

  /** Commit metadata (`#meta:` header lines) of a version. */
  def meta(spark: SparkSession, dir: String, version: Int = 0): Map[String, String] = {
    val f = fs(spark, dir)
    val v = if (version > 0) version else latestVersion(spark, dir)
    if (v == 0) Map.empty
    else manifestLines(f, dir, v)
      .filter(_.startsWith("#meta:"))
      .map(_.stripPrefix("#meta:").split("=", 2))
      .collect { case Array(k, vl) => k -> vl }.toMap
  }

  /** OPTIMIZE: rewrite the CURRENT snapshot into `targetFiles` files as
    * a new commit — history stays readable, the pointer swaps, and if
    * the manifest carries zone-map stats the rewrite lays files out
    * range-partitioned on the first stat column so the maps stay tight
    * (small per-batch commits otherwise accumulate unboundedly — the
    * same fragment problem DedupIndex.compact solves for buckets). */
  def compact(spark: SparkSession, dir: String, targetFiles: Int): Int = {
    val f = fs(spark, dir)
    val v = latestVersion(spark, dir)
    require(v > 0, s"no committed version at $dir")
    val statCols = manifestLines(f, dir, v).find(_.startsWith("#stats:"))
      .map(_.stripPrefix("#stats:").split(",").toSeq).getOrElse(Nil)
    val cur = read(spark, dir)
    val laidOut = statCols.headOption match {
      case Some(c) => cur.repartitionByRange(targetFiles, col(c))
      case None    => cur.repartition(targetFiles)
    }
    commit(spark, dir, laidOut, append = false, statCols = statCols,
      meta = Map("compactedFrom" -> v.toString))
  }

  private def entries(f: FileSystem, dir: String, version: Int)
      : (Seq[String], Seq[(String, Seq[Option[(Long, Long)]])]) = {
    val lines = manifestLines(f, dir, version)
    val statCols = lines.find(_.startsWith("#stats:"))
      .map(_.stripPrefix("#stats:").split(",").toSeq).getOrElse(Nil)
    val rows = lines.filterNot(_.startsWith("#")).map { line =>
      line.split("\t", 2) match {
        case Array(rel) => (rel, statCols.map(_ => None))
        case Array(rel, cells) =>
          val parts = cells.split(",")
          val ranges = statCols.indices.map { k =>
            val lo = parts(2 * k); val hi = parts(2 * k + 1)
            if (lo == "-" || hi == "-") None else Some((lo.toLong, hi.toLong))
          }
          (rel, ranges)
      }
    }
    (statCols, rows)
  }

  /** Read a snapshot (default: latest). The scan is exactly the
    * manifest's file list — never a directory listing. */
  def read(spark: SparkSession, dir: String, version: Int = 0): DataFrame =
    readWhere(spark, dir, version).df

  /** Read a snapshot with planning-time file skipping: files whose
    * recorded [min,max] for `statCol` cannot intersect [lo, hi] are
    * never opened; the exact predicate still applies to survivors. */
  def readWhere(spark: SparkSession, dir: String, version: Int = 0,
                statCol: String = null, lo: Long = Long.MinValue,
                hi: Long = Long.MaxValue): ScanPlan = {
    val f = fs(spark, dir)
    val v = if (version > 0) version else latestVersion(spark, dir)
    require(v > 0, s"no committed version at $dir")
    val (statCols, rows) = entries(f, dir, v)
    val keep =
      if (statCol == null) rows
      else {
        val k = statCols.indexOf(statCol)
        require(k >= 0, s"no recorded stats for $statCol (have $statCols)")
        rows.filter { case (_, ranges) =>
          ranges(k) match {
            case Some((mn, mx)) => mx >= lo && mn <= hi // ranges intersect
            case None           => true                 // unknown: never prune
          }
        }
      }
    require(keep.nonEmpty, "empty scan set: no file can match")
    val df0 = spark.read.parquet(keep.map { case (rel, _) => s"$dir/$rel" }: _*)
    val df =
      if (statCol == null) df0
      else df0.filter(col(statCol) >= lo && col(statCol) <= hi)
    ScanPlan(df, keep.size, rows.size)
  }

  /** SNAPSHOT DIFF — the CDC report between two committed versions:
    * rows present in `vNew` but not `vOld` ('added') and vice versa
    * ('removed'), as exact MULTISET differences (a row changed in
    * place shows up as one removed + one added). Because both sides
    * are immutable manifests, the diff is reproducible forever — the
    * audit trail a mutable table cannot give. Scale shape: two scans +
    * one hash-partitioned exceptAll per direction; for key-bounded
    * diffs, filter both sides first (zone maps apply). */
  def diff(spark: SparkSession, dir: String, vOld: Int, vNew: Int): DataFrame = {
    val a = read(spark, dir, vOld)
    val b = read(spark, dir, vNew)
    b.exceptAll(a).withColumn("change", lit("added"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("removed")))
  }

  /** DESCRIBE HISTORY: one row per surviving committed version —
    * (version, n_files, meta as "k=v;…"). Metadata-only: manifests are
    * O(files) text, never data. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    val f = fs(spark, dir)
    val v = latestVersion(spark, dir)
    import spark.implicits._
    (1 to v).flatMap { kv =>
      if (!f.exists(manifestPath(dir, kv))) None
      else Some((kv.toLong, entries(f, dir, kv)._2.size.toLong,
        meta(spark, dir, kv).toSeq.sorted
          .map { case (k, vl) => s"$k=$vl" }.mkString(";")))
    }.toDF("version", "n_files", "meta")
  }

  /** Drop the whole table (test/fixture hygiene). */
  def destroy(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    f.delete(new Path(dir), true)
  }
}
