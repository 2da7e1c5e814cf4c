package graft

import graft.operators.OpCaches
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Pins the cache-ownership contract: handles tracked inside a
  * [[graft.operators.OpCaches.scoped]] block belong to the returned
  * scope, releasing one scope leaves a concurrent owner's load-bearing
  * caches resident, and releaseAll remains the sequential-harness drain
  * for every scope (the Verify/Bench contract). */
class OpCachesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("scoped release evicts only the owner's handles") {
    import spark.implicits._
    val (a, scopeA) = OpCaches.scoped(OpCaches.track(Seq(1, 2, 3).toDF("x")))
    val (b, scopeB) = OpCaches.scoped(OpCaches.track(Seq(4, 5).toDF("y")))
    a.count(); b.count()
    assert(scopeA.size === 1 && scopeB.size === 1)
    scopeA.release(blocking = true)
    assert(a.storageLevel === StorageLevel.NONE, "owner's cache not evicted")
    assert(b.storageLevel !== StorageLevel.NONE,
      "releasing scope A must not evict scope B's cache")
    scopeB.release(blocking = true)
    assert(b.storageLevel === StorageLevel.NONE)
  }

  test("nested scopes: inner tracks win while active, outer restored after") {
    import spark.implicits._
    val ((inner, innerScope), outerScope) = OpCaches.scoped {
      val in = OpCaches.scoped(OpCaches.track(Seq(1).toDF("i")))
      OpCaches.track(Seq(2).toDF("o"))
      in
    }
    assert(innerScope.size === 1)
    assert(outerScope.size === 1, "post-inner track must land in the outer scope")
    inner.count()
    innerScope.release(blocking = true)
    outerScope.release(blocking = true)
  }

  test("releaseAll drains root and scoped handles; scope.release stays a no-op after") {
    import spark.implicits._
    val rootTracked = OpCaches.track(Seq(9).toDF("r"))
    val (scoped, scope) = OpCaches.scoped(OpCaches.track(Seq(8).toDF("s")))
    rootTracked.count(); scoped.count()
    OpCaches.releaseAll(blocking = true)
    assert(rootTracked.storageLevel === StorageLevel.NONE)
    assert(scoped.storageLevel === StorageLevel.NONE)
    assert(scope.size === 0)
    scope.release(blocking = true) // must not throw
  }
}
