package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the budget-bounded generation cache: same-key re-entry
  * keeps frames warm; a new key under storage pressure evicts the
  * least-recently-used generation first and never the one just opened.
  */
class IntraQueryCacheSpec extends AnyFunSuite with BeforeAndAfterEach {
  private val spark = TestSpark.spark
  import spark.implicits._

  override def beforeEach(): Unit = IntraQueryCache.reset()
  override def afterEach(): Unit = {
    sys.props -= "graft.cache.budget.fraction"
    sys.props -= "graft.cache.budget.minKeep"
    IntraQueryCache.reset()
  }

  private def frame(tag: Int) =
    spark.range(0, 1000).map(i => (i, s"tag$tag-$i")).toDF("id", "s")

  private def isCached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != StorageLevel.NONE

  test("same-key re-entry keeps the generation's frames cached") {
    IntraQueryCache.newGeneration("qA")
    val a = IntraQueryCache.scoped(frame(1))
    a.count()
    assert(isCached(a))
    // rerun of the same query: frames survive re-entry
    IntraQueryCache.newGeneration("qA")
    assert(isCached(a))
    // and a DIFFERENT key under NO pressure leaves them alone too
    IntraQueryCache.newGeneration("qB")
    assert(isCached(a))
  }

  test("re-entering a generation bumps it to MRU: the STALE one evicts first") {
    sys.props("graft.cache.budget.fraction") = "0.0"
    sys.props("graft.cache.budget.minKeep") = "2"
    IntraQueryCache.newGeneration("first")
    val a = IntraQueryCache.scoped(frame(10)); a.count()
    IntraQueryCache.newGeneration("second")
    val b = IntraQueryCache.scoped(frame(11)); b.count()
    val deadline = System.nanoTime() + 10_000_000_000L
    while (spark.sparkContext.getRDDStorageInfo.isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
    // rerun of "first" — now MRU despite being created earlier
    IntraQueryCache.newGeneration("first")
    assert(isCached(a) && isCached(b))
    // pressure with a third key: "second" is now the LRU and must go
    IntraQueryCache.newGeneration("third")
    IntraQueryCache.scoped(frame(12))
    assert(!isCached(b), "stale generation should evict first")
    assert(isCached(a), "re-entered generation must survive as MRU")
  }

  test("budget pressure evicts LRU generations, never the new one") {
    // force the budget to ~zero so any cached byte counts as pressure,
    // and drop the keep-floor so two generations are enough to trigger
    sys.props("graft.cache.budget.fraction") = "0.0"
    sys.props("graft.cache.budget.minKeep") = "1"
    IntraQueryCache.newGeneration("old")
    val old = IntraQueryCache.scoped(frame(2))
    old.count() // materialize so the status store sees cached bytes
    // the status store is event-loop updated; wait for it to report
    val deadline = System.nanoTime() + 10_000_000_000L
    while (spark.sparkContext.getRDDStorageInfo.isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getRDDStorageInfo.nonEmpty)

    IntraQueryCache.newGeneration("fresh")
    val fresh = IntraQueryCache.scoped(frame(3))
    assert(!isCached(old), "LRU generation should be evicted under pressure")
    assert(isCached(fresh), "the just-opened generation must survive")
    // correctness is unaffected: the evicted frame recomputes on demand
    assert(old.count() == 1000)
  }
}
