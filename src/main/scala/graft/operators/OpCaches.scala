package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** A releasable set of operator cache handles owned by ONE pipeline
  * invocation. Obtained via [[OpCaches.scoped]]; releasing it
  * unpersists exactly the handles tracked while the scope was active,
  * so concurrent pipelines (or parallel test suites sharing the
  * session) cannot evict each other's load-bearing caches. */
final class CacheScope private[operators] () {
  private val handles = ArrayBuffer.empty[DataFrame]
  private var released = false

  private[operators] def add(df: DataFrame): Unit = {
    val late = synchronized {
      if (released) true else { handles += df; false }
    }
    // a track() racing release(): the scope is already drained and
    // deregistered, so a handle registered now could never be drained
    // by releaseAll — unpersist it immediately instead of leaking it
    if (late) { try df.unpersist() catch { case _: Throwable => () } }
  }

  /** Number of still-tracked handles (test visibility). */
  def size: Int = synchronized { handles.size }

  /** Drain every tracked handle without closing the scope (the root
    * scope stays open across releaseAll calls). */
  private[operators] def drain(blocking: Boolean): Unit = synchronized {
    handles.foreach { df =>
      try df.unpersist(blocking) catch { case _: Throwable => () }
    }
    handles.clear()
  }

  /** Unpersist every handle tracked under this scope and CLOSE it: a
    * subsequent `track()` into this scope unpersists its handle
    * immediately (nothing can leak into a deregistered scope).
    * `blocking = true` waits for block eviction (tests assert on
    * CacheManager state immediately after). Idempotent. Also
    * deregisters this scope from the global registry, so repeated
    * scoped-pipeline runs do not accumulate dead scopes (releaseAll
    * remains able to drain scopes that were never released). */
  def release(blocking: Boolean = false): Unit = {
    synchronized { released = true; () }
    drain(blocking)
    OpCaches.deregister(this)
  }
}

/** Registry for the intermediate relations the dedup/cleaning operators
  * `.cache()` internally (banding signatures, prefix relations, token
  * sets, masks). Those caches are load-bearing — a broadcast-hash
  * SELF-join has no shared exchange to reuse, so without them the
  * expensive lineage is computed twice — but the operator methods return
  * LAZY DataFrames, so they cannot unpersist their own handles: the
  * caller's first action is what materializes (and re-reads) them.
  *
  * Ownership model: every internal cache is routed through [[track]],
  * which registers the handle with the CALLING THREAD's innermost open
  * [[CacheScope]] (opened by [[scoped]]), falling back to the shared
  * root scope. A caller that wants isolation from other pipelines on
  * the same session wraps the operator CALL (the plan build — that is
  * when `track` runs, actions can happen later) in `scoped` and
  * releases the returned scope when done:
  *
  * {{{
  * val (cleaned, caches) = OpCaches.scoped(TrainingData.clean(docs))
  * cleaned.write.parquet(out)
  * caches.release()
  * }}}
  *
  * [[releaseAll]] remains the harness-level drain: it unpersists EVERY
  * tracked handle in every scope (Verify/Bench run queries strictly
  * sequentially, so the big hammer is correct there). Do not call it
  * from code that may run concurrently with another pipeline — use a
  * scope.
  */
object OpCaches {
  private val root = new CacheScope
  // all scopes ever opened and not yet drained — releaseAll's inventory
  private val scopes = ArrayBuffer[CacheScope](root)
  private val current = new ThreadLocal[CacheScope] {
    override def initialValue(): CacheScope = root
  }

  /** Cache `df` and register the handle with the calling thread's
    * active scope (the root scope outside any [[scoped]] block). */
  def track(df: DataFrame): DataFrame = {
    df.cache()
    current.get.add(df)
    df
  }

  /** Register an already-materialized relation (a `localCheckpoint`)
    * for scope-time release WITHOUT adding a cache layer on top — the
    * checkpoint blocks are the storage; release() unpersists them.
    * Used by the iterative operators whose per-round snapshots must
    * outlive the loop (the final union still reads them) but not the
    * query. */
  def trackMaterialized(df: DataFrame): DataFrame = {
    current.get.add(df)
    df
  }

  /** Run `body` (an operator plan build) with a fresh scope active on
    * this thread; returns the result together with the scope owning
    * every handle tracked during the build. Nestable — the inner scope
    * wins while active; the previous scope is restored on exit. If
    * `body` throws, everything tracked so far is released before the
    * exception propagates — the caller never receives the scope, so it
    * could not release the orphaned caches itself. */
  def scoped[T](body: => T): (T, CacheScope) = {
    val scope = new CacheScope
    synchronized { scopes += scope }
    val prev = current.get
    current.set(scope)
    try (body, scope)
    catch { case e: Throwable => scope.release(); throw e }
    finally current.set(prev)
  }

  /** Forget a released scope (called by CacheScope.release). The ROOT
    * scope is never forgotten: it is the fallback every un-scoped
    * track() writes to, so dropping it from the registry would orphan
    * everything tracked after the first releaseAll (whose drain path
    * also calls release() on root). */
  private[operators] def deregister(scope: CacheScope): Unit =
    synchronized { if (scope ne root) scopes -= scope }

  /** Unpersist every tracked handle in EVERY scope — sequential-harness
    * cleanup (Verify/Bench/tests), not for concurrent callers. Drained
    * non-root scopes are forgotten; their `release()` stays a no-op. */
  def releaseAll(blocking: Boolean = false): Unit = {
    val snapshot = synchronized {
      val all = scopes.toList
      scopes.clear()
      scopes += root
      all
    }
    // the root scope is DRAINED, never closed: it stays registered as
    // the fallback target of every un-scoped track()
    snapshot.foreach { s =>
      if (s eq root) s.drain(blocking) else s.release(blocking)
    }
  }
}
