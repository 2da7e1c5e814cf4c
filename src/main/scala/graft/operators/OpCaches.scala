package graft.operators

import org.apache.spark.sql.DataFrame

/** Registry for the intermediate relations the dedup/cleaning operators
  * `.cache()` internally (banding signatures, prefix relations, token
  * sets, masks). Those caches are load-bearing — a broadcast-hash
  * SELF-join has no shared exchange to reuse, so without them the
  * expensive lineage is computed twice — but the operator methods return
  * LAZY DataFrames, so they cannot unpersist their own handles: the
  * caller's first action is what materializes (and re-reads) them.
  *
  * Every such cache is routed through [[track]], and a caller that has
  * finished acting on an operator's result releases ALL of the session's
  * operator caches with [[releaseAll]] — deterministic executor-memory
  * hygiene without `spark.catalog.clearCache()`'s collateral damage to
  * caches the caller owns. Tests pin the contract: after
  * `clean()` + action + `releaseAll()`, the shared CacheManager is
  * empty.
  */
object OpCaches {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Cache `df` and register the handle for a later [[releaseAll]]. */
  def track(df: DataFrame): DataFrame = synchronized {
    tracked += df.cache()
    df
  }

  /** Unpersist every tracked handle. `blocking = true` waits for the
    * block eviction (tests assert on CacheManager state immediately
    * after). */
  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach { df =>
      try df.unpersist(blocking) catch { case _: Throwable => () }
    }
    tracked.clear()
  }
}
