package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized view maintained FROM A SNAPSHOT TABLE'S
  * COMMIT LOG — the composition that makes streaming MV maintenance
  * exactly-once BY CONSTRUCTION instead of by careful crash-window
  * reasoning:
  *
  *   - the base table is a [[SnapTable]]: every micro-batch lands as
  *     one atomic, batchId-guarded commit (s16's kernel), so the set
  *     of rows in any version is immutable and replay-safe;
  *   - the MV's delta feed is the MANIFEST DIFF between the last
  *     synced version and the current one — version v's new files are
  *     exactly `files(v) \ files(v-1)`, immutable forever, so a
  *     crash-replayed `sync()` re-derives the IDENTICAL delta;
  *   - MV state is a generation directory plus a `_latest` pointer
  *     ("generation syncedVersion") swapped by write-temp +
  *     atomic-rename. A crash mid-generation-write leaves an orphan
  *     directory and an unmoved pointer; the next sync rebuilds the
  *     same generation from the same immutable delta. There is no
  *     crash window in which a delta can be folded twice.
  *
  * The fold itself is [[graft.plans.MatViewRewrite]]'s partial-merge
  * semantics: per group, COUNT partials add, SUM partials add, MIN/MAX
  * partials fold — O(delta + summary) work per sync, never a base-table
  * pass. Append-only commits only (an overwrite/delete version changes
  * existing membership; `sync` detects removed files and refuses —
  * retractable aggregates are declared out of scope, same as refresh).
  *
  * At 100 TB this is the Delta/Iceberg "incremental view maintenance
  * off the table log" shape: the dashboard reads a KB-scale summary
  * that is exactly as fresh as the last published version, and
  * maintenance cost scales with ingest, not table size.
  */
object SnapMv {

  final case class State(generation: Int, syncedVersion: Int)

  /** Measure columns in the summary: `_cnt` plus `_sum_i`/`_min_i`/
    * `_max_i` in declaration order. */
  final case class MvSpec(groupCols: Seq[String], sums: Seq[Column] = Nil,
                          mins: Seq[Column] = Nil, maxs: Seq[Column] = Nil)

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(s"$dir/_latest")

  def state(spark: SparkSession, mvDir: String): State = {
    val f = fs(spark, mvDir)
    if (!f.exists(pointer(mvDir))) State(0, 0)
    else {
      val in = f.open(pointer(mvDir))
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      val Array(g, v) = s.split(" ")
      State(g.toInt, v.toInt)
    }
  }

  private def swapPointer(f: FileSystem, mvDir: String, st: State): Unit = {
    val p = pointer(mvDir)
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(s"${st.generation} ${st.syncedVersion}".getBytes("UTF-8"))
    finally out.close()
    if (f.exists(p)) f.delete(p, false)
    if (!f.rename(tmp, p))
      throw new java.io.IOException(s"rename $tmp -> $p failed")
  }

  private def partialAgg(df: DataFrame, spec: MvSpec): DataFrame = {
    val aggCols =
      Seq(count(lit(1)).as("_cnt")) ++
        spec.sums.zipWithIndex.map { case (c, i) => sum(c).as(s"_sum_$i") } ++
        spec.mins.zipWithIndex.map { case (c, i) => min(c).as(s"_min_$i") } ++
        spec.maxs.zipWithIndex.map { case (c, i) => max(c).as(s"_max_$i") }
    df.groupBy(spec.groupCols.map(df(_)): _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Current summary relation (empty-schema error if never synced). */
  def read(spark: SparkSession, mvDir: String): DataFrame = {
    val st = state(spark, mvDir)
    require(st.generation > 0, s"MV at $mvDir has never synced")
    spark.read.parquet(s"$mvDir/gen-${st.generation}")
  }

  /** Fold every not-yet-synced committed version of `tableDir` into the
    * summary, one generation per version. Idempotent: driven entirely
    * by durable state (table manifests + the MV pointer), so replays,
    * retries, and crash re-runs converge to the same summary. Returns
    * the resulting state. */
  def sync(spark: SparkSession, tableDir: String, mvDir: String,
           spec: MvSpec): State = {
    val f = fs(spark, mvDir)
    var st = state(spark, mvDir)
    val latest = SnapTable.latestVersion(spark, tableDir)
    while (st.syncedVersion < latest) {
      val v = st.syncedVersion + 1
      val prev: Set[String] =
        if (v == 1) Set.empty
        else SnapTable.files(spark, tableDir, v - 1).toSet
      val cur = SnapTable.files(spark, tableDir, v)
      val removed = prev -- cur.toSet
      require(removed.isEmpty,
        s"version $v removed ${removed.size} file(s) — SnapMv folds " +
          "append-only commits (retractions are out of scope)")
      val delta = cur.filterNot(prev)
      val deltaAgg =
        if (delta.isEmpty) None
        else Some(partialAgg(
          spark.read.parquet(
            delta.map(r => SnapTable.resolvePath(tableDir, r)): _*), spec))
      val next = (st.generation, deltaAgg) match {
        case (0, None) =>
          // an empty first commit: an empty summary with the right schema
          partialAgg(SnapTable.read(spark, tableDir, v).limit(0), spec)
        case (0, Some(da)) => da
        case (g, None)     => spark.read.parquet(s"$mvDir/gen-$g")
        case (g, Some(da)) =>
          val prevSum = spark.read.parquet(s"$mvDir/gen-$g")
          val merged = prevSum.unionByName(da)
          val folded = merged.groupBy(spec.groupCols.map(merged(_)): _*)
            .agg(
              sum(col("_cnt")).cast("long").as("_cnt"),
              (spec.sums.indices.map { i =>
                val c = s"_sum_$i"
                sum(col(c)).cast(prevSum.schema(c).dataType).as(c)
              } ++ spec.mins.indices.map { i =>
                val c = s"_min_$i"; min(col(c)).as(c)
              } ++ spec.maxs.indices.map { i =>
                val c = s"_max_$i"; max(col(c)).as(c)
              }): _*)
          folded
      }
      val gen = st.generation + 1
      next.write.mode("overwrite").parquet(s"$mvDir/gen-$gen")
      st = State(gen, v)
      swapPointer(f, mvDir, st)
    }
    st
  }

  /** Drop the MV (test/fixture hygiene). */
  def destroy(spark: SparkSession, mvDir: String): Unit = {
    val f = fs(spark, mvDir)
    f.delete(new Path(mvDir), true)
  }
}
