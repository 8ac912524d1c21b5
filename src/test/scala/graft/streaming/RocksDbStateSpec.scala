package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.TestSpark

/** The streaming dedup family on the RocksDB state-store provider — the
  * 100 TB posture ([[StateBackend]]): dedup state must live off-heap /
  * on-disk, not in executor heap. Each case runs an existing
  * StreamDedupSpec / CorpusStreamSpec scenario under RocksDB and asserts
  * identical results, plus one stop/restart case proving (a) state
  * physically persisted in RocksDB format and (b) the provider choice is
  * pinned in the checkpoint across restarts.
  */
class RocksDbStateSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** RocksDB uploads per-version snapshots as `N.zip` under the state
    * dir (the heap provider writes `N.delta`/`N.snapshot`) — presence of
    * a zip is physical proof the RocksDB provider ran the query's state.
    */
  private def rocksFiles(ckpt: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(ckpt, "state")).filter(_.getName.endsWith(".zip"))
  }

  test("bucket state survives stop + restart in RocksDB; provider pinned in the checkpoint") {
    val ckpt = Files.createTempDirectory("graft-rocks-ckpt").toString
    val text = "alpha beta gamma delta"
    val hits = scala.collection.mutable.Set.empty[(Long, Long)]
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    def writer = StreamDedup.candidates(stream)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamDedup.DupHit], _: Long) =>
        val rows = df.collect()
        hits.synchronized { rows.foreach(h => hits += ((h.doc_a, h.doc_b))) }
      }

    // leg 1 under RocksDB: doc 1 enters bucket state, no pairs yet
    val q1 = StateBackend.withRocksDB(spark)(writer.start())
    try {
      mem.addData((1L, text))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(hits.isEmpty)
    assert(rocksFiles(ckpt).nonEmpty,
      s"no RocksDB snapshot zips under $ckpt/state — heap provider ran instead")

    // leg 2 under an explicitly HEAP-scoped session (withHeap also opts
    // out of the builder's r8 RocksDB default): the checkpoint's
    // offset-log metadata must restore the RocksDB provider ANYWAY —
    // stronger than the old unset-conf leg — and doc 1's signature must
    // still be in bucket state to pair with the new arrivals
    val nZips = rocksFiles(ckpt).size
    val q2 = StateBackend.withHeap(spark) {
      assert(spark.conf.get(StateBackend.ProviderKey) == StateBackend.Heap)
      writer.start()
    }
    try {
      mem.addData((2L, text), (3L, text))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(hits.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(rocksFiles(ckpt).size > nZips, "restart wrote no new RocksDB versions")
  }

  test("unbounded-keyspace builders default the session onto RocksDB; opt-out respected") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    spark.conf.unset(StateBackend.ProviderKey)
    StreamDedup.candidates(stream)
    assert(spark.conf.get(StateBackend.ProviderKey) == StateBackend.RocksDB)
    // opt-out flag holds the heap default even through a builder call
    spark.conf.unset(StateBackend.ProviderKey)
    spark.conf.set(StateBackend.HeapDefaultKey, "true")
    try {
      StreamDedup.candidates(stream)
      assert(spark.conf.get(StateBackend.ProviderKey) == StateBackend.Heap)
    } finally spark.conf.unset(StateBackend.HeapDefaultKey)
    // an explicitly pinned provider is never overridden — including an
    // explicit pin of the HEAP provider (the user's documented way to
    // keep heap without knowing about the opt-out flag)
    spark.conf.set(StateBackend.ProviderKey, StateBackend.Heap)
    StreamDedup.candidates(stream)
    assert(spark.conf.get(StateBackend.ProviderKey) == StateBackend.Heap)
    spark.conf.set(StateBackend.ProviderKey, StateBackend.RocksDB)
    StreamDedup.candidates(stream)
    assert(spark.conf.get(StateBackend.ProviderKey) == StateBackend.RocksDB)
  }

  test("event-time TTL eviction behaves identically on RocksDB") {
    // the StreamDedupSpec TTL scenario verbatim, under RocksDB: aged
    // entries evict and free capped slots, in-window pairs still hit
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val text = "alpha beta gamma delta"
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = mem.toDS
      .select(col("_1").as("doc_id"), col("_2").as("ts"), col("_3").as("text"))
    val q = StateBackend.withRocksDB(spark) {
      StreamDedup.candidatesWithTtl(stream, windowMs = 10000, maxPerBucket = 2)
        .writeStream.format("memory").queryName("dedup_ttl_rocks")
        .outputMode("append").start()
    }
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
    val got = spark.table("dedup_ttl_rocks")
      .select("doc_a", "doc_b").distinct()
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (4L, 5L)))
  }

  test("watermarked exact dedup (dropDuplicatesWithinWatermark) runs on RocksDB") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val stream = mem.toDS
      .select(col("_1").as("doc_id"), col("_2").as("time"),
        org.apache.spark.sql.functions.md5(col("_3")).as("fp"))
    val q = StateBackend.withRocksDB(spark) {
      Ingest.dedupStream(stream, Seq("fp"), watermark = "10 seconds")
        .writeStream.format("memory").queryName("corpus_rocks")
        .outputMode("append").start()
    }
    try {
      mem.addData((1L, ts(100), "aa bb"), (2L, ts(101), "aa bb"), (3L, ts(102), "cc dd"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("corpus_rocks")
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }
}
