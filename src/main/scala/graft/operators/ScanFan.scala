package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan fan-out (guide §2.2/§6 + §1.2: fix the
  * distributed algorithm's parallelism before per-task work).
  *
  * A parquet scan parallelizes at best one task per planned split, and
  * in practice one per ROW GROUP — a small table written as a single
  * row group (the bench fixtures; any dimension-sized table in
  * production) executes its scan stage, and every expression fused into
  * it (tokenize + explode, per-row quantization, partial aggregation),
  * on ONE core while the rest of the cluster idles.
  *
  * `fan(df, key)` hash-repartitions to the session's default
  * parallelism — but ONLY when the planned input is too small for the
  * file layout to feed that parallelism by itself
  * (estimated bytes < maxPartitionBytes × cores: fewer planned splits
  * than cores). The gate makes it the identity at scale: a 100 TB scan
  * yields ~million splits and never pays the extra exchange, while the
  * bytes the exchange moves when it DOES fire are bounded by
  * maxPartitionBytes × cores (a few GB at most — one split's worth per
  * core).
  *
  * The key must be high-cardinality (a row id): hash repartitioning on
  * a real key is deterministic under task retry (guide §2.5's
  * round-robin caveat) and skips the local sort a keyless
  * `repartition(n)` pays (SPARK-23207). Downstream `groupBy(key)` /
  * joins on the key reuse the exchange outright.
  */
object ScanFan {
  def fan(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
    val bytes =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => return df }
    if (bytes < BigInt(maxPB) * cores) df.repartition(cores, key) else df
  }
}
