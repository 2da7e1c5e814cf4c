package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out utilities: the shuffle-shaping patterns a 1000-executor
  * deployment leans on (SURVEY §4; builder-prompt "Partitioning & shuffle").
  */
object Scale {

  /** Two-phase salted aggregation for skewed keys: COUNT/SUM-style
    * partial aggregates are computed per (key, salt) — spreading one hot
    * key over `salts` reducers — then combined per key. Identical results
    * to a plain groupBy for any decomposable aggregate; use when one key
    * holds a disproportionate share of rows and AQE's skew handling can't
    * kick in (e.g. pre-AQE stages, or aggregations rather than joins).
    */
  def saltedCount(df: DataFrame, key: String, salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("cnt"))

  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))

  /** Salted equi-join for skewed join keys: every row of the LARGE side
    * draws a salt in [0, salts) (any per-row value works — the salt never
    * reaches the output), the SMALL side is replicated once per salt
    * value, and the join runs on (key, salt) — so one hot key's rows
    * spread over `salts` reducers instead of funneling through one.
    * Result is bit-identical to the plain equi-join (every large row
    * still meets every matching small row exactly once, at its own salt
    * replica). Use when BOTH sides are too large to broadcast and one
    * join key dominates; costs a `salts`× blow-up of the small side,
    * which is the standard trade (Spark's AQE skew handling splits
    * oversized partitions after the fact; salting shapes the shuffle
    * before it happens and also covers sort-merge buffers).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val l = large.withColumn("_salt",
      pmod(spark_partition_id().cast("long") + monotonically_increasing_id(),
        lit(salts.toLong)))
    val sm = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(sm, Seq(key, "_salt")).drop("_salt")
  }

  /** Write a DataFrame bucketed + sorted by a join key. Two tables
    * bucketed the same way join WITHOUT a shuffle (each bucket pair is
    * co-located) — at 100 TB this turns the nightly fact-to-fact join
    * from the dominant shuffle into a local merge. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    writeBucketed(df, table, Seq(key), buckets)

  /** Multi-column bucket spec: shuffle-free joins require the join keys
    * to cover the bucket columns on both sides.
    *
    * Idempotent across JVMs: a fresh session's in-memory catalog doesn't
    * know about a managed-table directory a PREVIOUS run left in the
    * warehouse, so a bare `mode("overwrite").saveAsTable` throws
    * LOCATION_ALREADY_EXISTS on every rerun in a used workspace. Drop
    * the catalog entry AND delete any stale location first — reruns then
    * behave exactly like first runs (ScaleSpec pins the rerun). */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    val fs = loc.getFileSystem(org.apache.spark.sql.GraftBridge.sessionHadoopConf(spark))
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed catalog tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** Hive-style partitioned write: equality/IN predicates on the
    * partition columns prune DIRECTORIES at planning time (the scan's
    * `PartitionFilters`), so a filtered read of a 100 TB corpus opens
    * only the touched partitions — no footer even gets read elsewhere.
    * Partition columns should be low-cardinality (lang, source, date);
    * high-cardinality values belong in bucketing or sort order. */
  def writePartitioned(df: DataFrame, path: String,
                       cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Morton (Z-order) key of two non-negative integer coordinates —
    * bit-interleaved so that points close in BOTH dimensions are close
    * in the one-dimensional sort order. Writing spatial data sorted by
    * this key gives every file/row-group a TIGHT min/max envelope in
    * both x and y, so a box predicate prunes on both coordinates via
    * ordinary parquet statistics — a single-column sort order can only
    * ever prune on its leading column. 21 bits per coordinate (42-bit
    * key) covers the geo grid's cell ids with room to spare. Pure
    * built-ins (HOF fold over the bit positions), codegen-friendly,
    * identical semantics anywhere Spark runs.
    *
    * DOMAIN: 0 ≤ v < 2²¹ per coordinate. Inputs are masked to their
    * low 21 bits, so an out-of-range (or negative) coordinate still
    * yields an in-domain key — clustering quality degrades for such
    * values (distant coordinates can alias), but the key never
    * propagates sign bits or exceeds 42 bits. Callers with wider
    * coordinates should pre-scale into the domain. */
  /** Driver-side morton key for deriving z-range CONSTANTS (box corners)
    * that bound a box query's z values — same bit math as `zorder2`.
    * Because the interleave is monotone in each coordinate separately,
    * every point inside the box [x1,x2]×[y1,y2] has
    * mortonKey(x1,y1) ≤ z ≤ mortonKey(x2,y2): the z-range is a sound
    * coarse prefilter (a superset), never a lossy one. */
  def mortonKey(x: Long, y: Long): Long =
    (0 to 20).foldLeft(0L) { (acc, i) =>
      acc | ((((x & 2097151L) >> i) & 1L) << (2 * i)) |
        ((((y & 2097151L) >> i) & 1L) << (2 * i + 1))
    }

  def zorder2(x: String, y: String): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(sequence(0, 20), 0L, (acc, i) ->
         |  acc | shiftleft((($x & 2097151) >> i) & 1L, 2 * i)
         |      | shiftleft((($y & 2097151) >> i) & 1L, 2 * i + 1))""".stripMargin)

  /** Write `df` z-order-clustered on two integer columns: range-
    * partition by the Morton key (balanced output files), sort within
    * partitions, write parquet. `files` controls the file count —
    * at scale, one file per task; locally, enough files that min/max
    * pruning has granularity to work with. */
  /** Write `df` as deterministic training SHARDS — qx6's last-mile
    * contract made a real writer: one output file per shard value,
    * rows inside each file in exactly `orderCols` order. The
    * repartition puts every shard's rows in one task (a task may hold
    * several shard values; the dynamic-partition writer splits them
    * into one file per value), and `sortWithinPartitions` leads with
    * the shard column so the writer's required partition-column
    * ordering is ALREADY satisfied — FileFormatWriter inserts no extra
    * sort, and the within-shard (orderCols) order flows into the file
    * verbatim. No global sort anywhere: shards order independently, so
    * at 100 TB the write is `shards` parallel sorted streams. */
  def writeSharded(df: DataFrame, path: String, shardCol: String,
                   shards: Int, orderCols: Seq[String]): Unit =
    df.repartition(shards, col(shardCol))
      .sortWithinPartitions((shardCol +: orderCols).map(col): _*)
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)

  def writeZOrdered(df: DataFrame, path: String, x: String, y: String,
                    files: Int): Unit =
    df.withColumn("_z", zorder2(x, y))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
