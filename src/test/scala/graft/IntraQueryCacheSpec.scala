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

  test("pid-snapshot persists: keep-2 per family — deferred plans stay " +
      "correct, the third input releases the oldest") {
    import graft.operators.TextOps
    def docs(lo: Long, tag: String) = spark.range(lo, lo + 50)
      .map(i => (i, s"tok$i $tag one two")).toDF("doc_id", "text")
    val (d1, d2, d3) = (docs(0, "a"), docs(100, "b"), docs(200, "c"))
    // build d1's plan but DON'T consume it yet — the deferred-consumer
    // interleave a single-slot registry would silently corrupt
    val deferred = TextOps.perplexityBucketsOver(d1, "snaprel-1")
    val snap1 = TextOps.pinnedSnapshot("perpbucket")
    assert(snap1.isDefined)
    // same input again: the snapshot is reused, not replaced
    TextOps.perplexityBucketsOver(d1, "snaprel-1")
    assert(TextOps.pinnedSnapshot("perpbucket").get eq snap1.get)
    // a SECOND input must NOT release d1's snapshot (keep-2): the
    // deferred d1 plan still consumes one consistent pid assignment
    TextOps.perplexityBucketsOver(d2, "snaprel-2").collect()
    val snap2 = TextOps.pinnedSnapshot("perpbucket")
    assert(isCached(snap1.get), "keep-2 violated: previous snapshot released")
    val fromDeferred = deferred.collect()
    // re-running d1 bumps its snapshot to MRU (and rides it warm)
    val fresh = TextOps.perplexityBucketsOver(d1, "snaprel-1").collect()
    assert(fromDeferred.map(_.toString).sorted.toSeq ===
      fresh.map(_.toString).sorted.toSeq)
    // the THIRD distinct input releases the LRU pinned corpus (d2 — d1
    // was bumped by the re-run above)
    TextOps.perplexityBucketsOver(d3, "snaprel-3").collect()
    val snap3 = TextOps.pinnedSnapshot("perpbucket")
    assert(snap3.isDefined && !(snap3.get eq snap1.get))
    val deadline = System.nanoTime() + 10_000_000_000L
    while (isCached(snap2.get) && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!isCached(snap2.get), "LRU input's snapshot still pinned")
    assert(isCached(snap1.get) && isCached(snap3.get))
    // release-on-supersede is observable in the session-level report:
    // after three datasets the family holds exactly two snapshots, and
    // only live (materialized) blocks are counted in its bytes
    val rep = TextOps.pinnedStorageReport(spark)
      .find(_._1 == "perpbucket")
    assert(rep.exists(_._2 == 2),
      s"pinned report should show exactly 2 perpbucket snapshots: $rep")
  }

  test("evicting a never-consumed pinned snapshot warns loudly; a consumed one evicts silently") {
    import graft.operators.TextOps
    def docs(lo: Long, tag: String) = spark.range(lo, lo + 50)
      .map(i => (i, s"tok$i $tag one two")).toDF("doc_id", "text")
    val orig = System.err
    def capturing(body: => Unit): String = {
      val buf = new java.io.ByteArrayOutputStream()
      try { System.setErr(new java.io.PrintStream(buf, true, "UTF-8")); body }
      finally System.setErr(orig)
      new String(buf.toByteArray, "UTF-8")
    }
    // d1's plan is built but NEVER consumed; d2 is consumed. The third
    // distinct input then evicts d1 (the LRU) — a contract violation
    // (frames over d1 are no longer pid-consistent) that must be loud.
    TextOps.perplexityBucketsOver(docs(0, "w1"), "snapwarn-1")
    val out1 = capturing {
      TextOps.perplexityBucketsOver(docs(100, "w2"), "snapwarn-2").collect()
    }
    assert(!out1.contains("NEVER-CONSUMED"), "keep-2 must not warn on the second input")
    var third: org.apache.spark.sql.DataFrame = null
    val out2 = capturing {
      third = TextOps.perplexityBucketsOver(docs(200, "w3"), "snapwarn-3")
    }
    assert(out2.contains("NEVER-CONSUMED"),
      "evicting the unconsumed d1 snapshot must warn loudly")
    // and the well-behaved interleave stays silent: every still-pinned
    // snapshot (w2 collected above, w3 here) is consumed before the next
    // registration (consuming the RETURNED frame — a rebuilt typed-map
    // input would be a fresh lambda and a genuinely different plan)
    third.collect()
    val out3 = capturing {
      TextOps.perplexityBucketsOver(docs(300, "w4"), "snapwarn-4").collect()
    }
    assert(!out3.contains("NEVER-CONSUMED"),
      "evicting a consumed snapshot must stay silent")
  }

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

  test("re-entering a generation dedupes plan-identical registrations") {
    // a bench sweep re-enters the same key every iteration and re-scopes
    // the same frames; the generation must hold ONE reference per
    // distinct plan, not one per iteration. Engine frames are built with
    // the DataFrame API (semantically stable across re-builds) — a typed
    // map closure would be a fresh lambda per build and genuinely NOT
    // the same plan (the CacheManager wouldn't share its blocks either)
    import org.apache.spark.sql.functions.{col, concat, lit}
    def stable(tag: Int) = spark.range(0, 1000).toDF("id")
      .withColumn("s", concat(lit(s"tag$tag-"), col("id")))
    for (_ <- 1 to 5) {
      IntraQueryCache.newGeneration("sweep")
      IntraQueryCache.scoped(stable(20))
      IntraQueryCache.scoped(stable(21))
    }
    assert(IntraQueryCache.retained("sweep") == 2)
    // a genuinely different plan under the same key still registers
    IntraQueryCache.newGeneration("sweep")
    IntraQueryCache.scoped(stable(22))
    assert(IntraQueryCache.retained("sweep") == 3)
  }

  test("concurrent builders register into their own generations") {
    sys.props("graft.cache.budget.fraction") = "0.0"
    sys.props("graft.cache.budget.minKeep") = "1"
    // two threads interleave newGeneration/scoped; frames must land on
    // the opener's key, so evicting one thread's generation never
    // releases the other's frames
    val framesByThread = new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.DataFrame]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val threads = Seq("tA" -> 30, "tB" -> 31).map { case (key, tag) =>
      new Thread(() => {
        IntraQueryCache.newGeneration(key)
        barrier.await() // both generations open before either scopes
        val df = IntraQueryCache.scoped(frame(tag))
        df.count()
        framesByThread.put(key, df)
        barrier.await()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    assert(IntraQueryCache.retained("tA") == 1)
    assert(IntraQueryCache.retained("tB") == 1)
    val a = framesByThread.get("tA"); val b = framesByThread.get("tB")
    assert(isCached(a) && isCached(b))
    // pressure from a third key on the main thread: the builder threads
    // are dead, so BOTH their generations are evictable LRU victims —
    // and each eviction releases exactly its own thread's frame
    val deadline = System.nanoTime() + 10_000_000_000L
    while (spark.sparkContext.getRDDStorageInfo.isEmpty &&
        System.nanoTime() < deadline) Thread.sleep(50)
    IntraQueryCache.newGeneration("main")
    IntraQueryCache.scoped(frame(32))
    assert(!isCached(a) && !isCached(b))
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
