package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.operators.TextOps

/** Streaming near-dup dedup: a fully-drained stream must emit exactly the
  * batch minhash-LSH candidate set, including pairs whose two documents
  * arrive in different micro-batches (bucket state carries across).
  */
class StreamDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("streamed near-dup hits equal the batch minhash-LSH candidate set") {
    // the xxhash64 PRODUCTION tier — the signature space StreamDedup
    // lives in (the declared q_minhash_lsh runs the md5 oracle tier)
    val expected = TextOps.minhashLshWith(spark, dir, TextOps.MinHashXx)
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"),
        col("est_jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty, "corpus has no near-dup pairs; test is vacuous")

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    // split so the pair with the smallest doc_b is GUARANTEED to straddle
    // the micro-batch boundary: its doc_a arrives in batch 1, doc_b in 2
    val splitAt = expected.map(_._2).min
    val (first, second) = docs.partition(_._1 < splitAt)
    assert(first.nonEmpty && second.nonEmpty)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = StreamDedup.candidates(stream)
      .writeStream.format("memory").queryName("dedup_hits")
      .outputMode("append").start()
    try {
      mem.addData(first.toSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("dedup_hits")
      .select("doc_a", "doc_b", "est_jaccard").distinct()
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("maxPerBucket bounds state: hot buckets degrade recall, never grow") {
    // 5 identical docs all land in the same buckets; cap 2 means doc 1 and
    // 2 are retained per bucket, docs 3-5 still HIT against them but are
    // not added — pairs among {3,4,5} are the sacrificed recall
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = StreamDedup.candidates(stream, maxPerBucket = 2)
      .writeStream.format("memory").queryName("dedup_capped")
      .outputMode("append").start()
    try {
      mem.addData((1L to 5L).map(i => (i, "alpha beta gamma delta")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_capped")
      .select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    val kept = Set(1L, 2L)
    val expected = (for {
      a <- 1L to 5L; b <- (a + 1) to 5L
      if kept.contains(a) || kept.contains(b)
    } yield (a, b)).toSet
    assert(got == expected)
  }

  test("event-time TTL: aged entries evict (freeing capped slots), in-window pairs still hit") {
    // identical text throughout; window 10 s, cap 2 (t=0 would tie the
    // initial watermark and be dropped as late, so time starts at 100 s):
    //   batch 1: docs 1 (t=100) + 2 (t=105) → in-window pair (1,2); full
    //   batch 2: doc 3 (t=160)              → watermark still 105 s:
    //            nothing evicted, bucket at cap → 3 NOT retained; and
    //            1/2 are out of its window → no hit
    //   batch 3: doc 4 (t=220)              → watermark 160 s: entries at
    //            100/105 s evict, so 4 takes a freed slot (proof eviction
    //            ran — doc 3 could not get one); no partner → no hit
    //   batch 4: doc 5 (t=225)              → pairs with 4 (Δ=5 s ≤ window)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val text = "alpha beta gamma delta"
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = mem.toDS
      .select(col("_1").as("doc_id"), col("_2").as("ts"), col("_3").as("text"))
    val q = StreamDedup.candidatesWithTtl(stream, windowMs = 10000, maxPerBucket = 2)
      .writeStream.format("memory").queryName("dedup_ttl")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(100), text), (2L, ts(105), text))
      q.processAllAvailable()
      mem.addData((3L, ts(160), text))
      q.processAllAvailable()
      mem.addData((4L, ts(220), text))
      q.processAllAvailable()
      mem.addData((5L, ts(225), text))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_ttl")
      .select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (4L, 5L)))
  }

  test("stream-vs-corpus-history hits: drained stream equals the batch run of the same code") {
    // existing corpus: the sf0.001 documents; stream: exact re-crawls of
    // two corpus docs (signature agreement 1.0 — deterministic hits at
    // any threshold) + one fresh doc
    val corpus = graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
    val base = corpus.as[(Long, String)].collect().sortBy(_._1)
    val streamDocs = Seq(
      (9001L, base(0)._2),
      (9002L, base(1)._2),
      (9003L, "completely fresh unrelated words only"))
    val idx = StreamDedup.corpusIndexOf(corpus).persist()

    // batch expectation: candidatesVsCorpus is stateless DataFrame code,
    // so running it over the same rows as a batch frame IS the contract
    val batchDf = streamDocs.toDF("doc_id", "text")
    val expected = StreamDedup.candidatesVsCorpus(batchDf, idx)
      .select("doc_id", "corpus_doc", "est_jaccard").distinct()
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.exists(_._1 == 9001L) && expected.exists(_._1 == 9002L),
      "near-copies must hit their corpus originals")
    assert(!expected.exists(_._1 == 9003L), "fresh doc must not hit")

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = StreamDedup.candidatesVsCorpus(stream, idx)
      .writeStream.format("memory").queryName("history_hits")
      .outputMode("append").start()
    try {
      mem.addData(streamDocs.take(2): _*)
      q.processAllAvailable()
      mem.addData(streamDocs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("history_hits")
      .select("doc_id", "corpus_doc", "est_jaccard").distinct()
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
  }

  test("refreshing corpus index: additions invisible until the refresh boundary, then hit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val textA = "alpha beta gamma delta"
    val textB = "epsilon zeta eta theta"
    StreamDedup.corpusIndexOf(Seq((1L, textA)).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(tmp)

    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    // refreshEvery = 2 → the index reloads on batches 0, 2, 4, …
    val q = StreamDedup.candidatesVsCorpusRefreshing(stream, tmp, refreshEvery = 2) {
      (df, bid) =>
        val rows = df.select("doc_id", "corpus_doc").distinct().collect()
        hits.synchronized {
          rows.foreach(r => hits += ((bid, r.getLong(0), r.getLong(1))))
        }
    }.start()
    try {
      // batch 0 (refresh): exact re-crawl of corpus doc 1 hits it
      mem.addData((9001L, textA))
      q.processAllAvailable()
      // a corpus addition lands on storage between batches — moved in at
      // the FILE level, the way a separate ingest process delivers it (a
      // same-session spark write would auto-recache the cached snapshot
      // via refreshByPath and defeat the staleness half of this test)
      val side = java.nio.file.Files.createTempDirectory("graft-idx-add").toString
      StreamDedup.corpusIndexOf(Seq((2L, textB)).toDF("doc_id", "text"))
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(tmp, part.getName))
      // batch 1 (no refresh): the snapshot is stale — 9002 misses doc 2
      mem.addData((9002L, textB))
      q.processAllAvailable()
      // batch 2 (refresh): the same text now hits the addition
      mem.addData((9003L, textB))
      q.processAllAvailable()
    } finally q.stop()

    assert(hits.toSet == Set((0L, 9001L, 1L), (2L, 9003L, 2L)),
      s"got $hits")
  }

  test("refreshing writer releases its final index snapshot when the query terminates") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-idx-rel").toString
    StreamDedup.corpusIndexOf(Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(tmp)
    val baseline = spark.sparkContext.getPersistentRDDs.size
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = StreamDedup.candidatesVsCorpusRefreshing(stream, tmp, refreshEvery = 2) {
      (df, _) => df.count(): Unit
    }.start()
    try {
      mem.addData((9001L, "alpha beta gamma delta"))
      q.processAllAvailable()
      assert(spark.sparkContext.getPersistentRDDs.size > baseline,
        "snapshot not persisted while the query runs")
    } finally q.stop()
    // onQueryTerminated is delivered async on the listener bus
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (spark.sparkContext.getPersistentRDDs.size > baseline &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.size == baseline,
      "final snapshot still cached after query termination")
  }
}
