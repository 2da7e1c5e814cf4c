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

  test("root survives releaseAll: later un-scoped tracks still drain") {
    // regression pin: releaseAll's drain path calls release() on every
    // scope INCLUDING root; release() deregisters its scope, which must
    // never forget root — handles tracked after the first releaseAll
    // would otherwise be orphaned forever
    import spark.implicits._
    OpCaches.releaseAll(blocking = true)
    val later = OpCaches.track(Seq(7).toDF("x"))
    later.count()
    OpCaches.releaseAll(blocking = true)
    assert(later.storageLevel === StorageLevel.NONE,
      "handle tracked after a releaseAll was orphaned (root deregistered)")
  }

  test("scoped() releases already-tracked handles when the body throws") {
    import spark.implicits._
    val probe = Seq(6).toDF("y")
    val thrown = intercept[RuntimeException] {
      OpCaches.scoped {
        OpCaches.track(probe)
        throw new RuntimeException("mid-build failure")
      }
    }
    assert(thrown.getMessage === "mid-build failure")
    assert(probe.storageLevel === StorageLevel.NONE,
      "caches tracked before the failure were orphaned — the caller never got the scope")
  }
}
