package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Budget-bounded LRU registry for INTRA-query persists (the pair-engine
  * groups/prefixes, the minhash signature table, the codec decode) —
  * frames a single query consumes 2-3× and then rarely needs again.
  *
  * Spark has no query-scoped cache release for a lazily returned plan,
  * and the unified memory manager PROTECTS cached blocks up to
  * `spark.memory.storageFraction` — so left alone these frames
  * accumulate for the JVM lifetime and, in a long multi-query session
  * (Bench, Verify, ScaleProbe), the dead cached blocks crowd out
  * EXECUTION memory. Measured: q_ngram_jaccard at the 10× probe scale
  * degraded ~4× (2.0 s → 14 s median) from spill pressure caused
  * entirely by EARLIER families' dead caches.
  *
  * Unconditional release-per-query is the wrong fix: Spark's
  * CacheManager matches persisted plans structurally, so a repeated
  * query (bench sweeps, a dashboard refresh) legitimately reuses the
  * previous run's frames warm — releasing them re-pays the build on
  * every run for no memory benefit when the session FITS. Instead each
  * engine entry point opens a KEYED generation ([[newGeneration]]) and
  * registers its frames via [[scoped]]:
  *
  *  - same key again → the existing generation is bumped to MRU and
  *    kept; re-persisting a plan-identical frame is a CacheManager
  *    no-op, so the rerun rides the warm blocks;
  *  - a new key first measures cached storage (`getRDDStorageInfo`,
  *    memory + disk) and, while it exceeds the budget (default 10% of
  *    the JVM heap, override `-Dgraft.cache.budget.fraction=`),
  *    releases least-recently-used generations — dead frames go
  *    first, and a session whose working set fits is never touched.
  *
  * The default budget deliberately undercuts the unified manager's
  * PROTECTED storage region (`spark.memory.fraction` 0.6 ×
  * `spark.memory.storageFraction` 0.5 ≈ 15% of a large heap after
  * overhead): cached blocks inside that region are immune to
  * execution-demand eviction, so letting scoped frames fill it is
  * exactly what starves the pair joins. Measured at the 10× probe:
  * with a 25% budget (never triggered) q_ngram_jaccard degraded to
  * 7.6 s; under the 10% budget the LRU release keeps it at ~1.6 s.
  *
  * Unpersisting a frame some stale plan still references is safe —
  * every scoped frame is a deterministic computation Spark recomputes
  * on demand. NONDETERMINISTIC frames (the `spark_partition_id`
  * assignment in packSequences) must NOT be scoped; see the plain
  * persist there. Cross-query index artifacts (VectorOps/TagIndex) are
  * deliberately not scoped either — they key on dataset fingerprint
  * with their own eviction.
  */
object IntraQueryCache {
  private val generations =
    new java.util.LinkedHashMap[String, scala.collection.mutable.ListBuffer[DataFrame]](
      16, 0.75f, /* accessOrder = */ true)
  private var current: scala.collection.mutable.ListBuffer[DataFrame] = _

  private def budgetBytes: Long = {
    val frac = sys.props.get("graft.cache.budget.fraction")
      .flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(0.10)
    (Runtime.getRuntime.maxMemory() * frac).toLong
  }

  /** Cached storage across the session, from the status store. The store
    * is event-loop updated so readings can lag an in-flight unpersist;
    * eviction therefore unpersists BLOCKING, and a lagging read at worst
    * over-evicts old generations — a cold re-run, never wrongness.
    */
  private def cachedBytes: Long =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum)
      .getOrElse(0L)

  /** Eviction floor: the budget measurement counts ALL session cached
    * storage, including deliberately-unscoped persists (the
    * packSequences pid frame, VectorOps index artifacts) — if those
    * alone exceed the budget, eviction could otherwise degrade to
    * release-everything-always. Keeping the `minKeep` most-recent
    * generations bounds that failure to "small warm set" instead.
    */
  private def minKeep: Int = sys.props.get("graft.cache.budget.minKeep")
    .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(4)

  /** Open (or re-enter) the generation for `key`; evict LRU generations
    * while the session's cached storage exceeds the budget.
    */
  def newGeneration(key: String): Unit = synchronized {
    val existing = generations.get(key) // bumps to MRU (accessOrder)
    if (existing != null) { current = existing; return }
    current = scala.collection.mutable.ListBuffer.empty[DataFrame]
    generations.put(key, current)
    while (generations.size > minKeep && cachedBytes > budgetBytes) {
      val eldest = generations.entrySet().iterator().next()
      if (eldest.getValue eq current) return // only the new one left
      eldest.getValue.foreach(_.unpersist(blocking = true))
      generations.remove(eldest.getKey)
    }
  }

  /** Persist `df` and register it with the current generation.
    *
    * Concurrency contract: `current` is process-global, so two threads
    * building queries at once can attribute one thread's frames to the
    * other's generation — those frames then age out on the WRONG key,
    * which costs a recompute, never correctness (every scoped frame is
    * deterministic, and a registered frame is always releasable: the
    * eviction loop never removes the generation `current` points to,
    * so appends always land inside the eviction domain). The engine's
    * mains build plans single-threaded; per-thread generations are the
    * upgrade path if that ever changes.
    */
  def scoped(df: DataFrame): DataFrame = synchronized {
    if (current == null) newGeneration("(unkeyed)")
    current += df
    df.persist()
  }

  /** Release everything (test hook). */
  private[graft] def reset(): Unit = synchronized {
    generations.values().forEach(_.foreach(_.unpersist(blocking = false)))
    generations.clear()
    current = null
  }
}
