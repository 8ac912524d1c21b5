package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.TestSpark
import graft.operators.TextOps

/** Streaming span dedup: a drained stream's manifests must equal the
  * batch incremental-span run over the same documents (the kernel is
  * stateless per document, but the spec pins it across micro-batch
  * boundaries and through the foreachBatch plumbing), and the
  * key-set refresh path must pick up corpus additions exactly at
  * refresh boundaries.
  */
class StreamSpanSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("streamed span manifests equal the batch incremental-span run") {
    val expected = TextOps.incrSpans(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "no batch docs overlap history; test is vacuous")

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect()
    val (newDocs, existing) = docs.partition(_._1 % 10 == 9)
    val keysPath = java.nio.file.Files.createTempDirectory("graft-spankeys").toString
    TextOps.spanKeysOf(existing.toSeq.toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(keysPath)

    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = SpanStream.spansVsCorpusRefreshing(stream, keysPath, refreshEvery = 1) {
      (df, _) =>
        val rows = df.as[(Long, Long, Long, Long)].collect()
        got.synchronized { got ++= rows }
    }.start()
    try {
      val sorted = newDocs.sortBy(_._1).toSeq
      val (b1, b2) = sorted.splitAt(sorted.size / 2)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.toSet == expected)
    assert(got.size == got.toSet.size, "a manifest row was emitted twice")
  }

  test("refreshing key set: additions invisible until the refresh boundary") {
    val keysPath = java.nio.file.Files.createTempDirectory("graft-spankeys").toString
    // 9 tokens → exactly two 8-token windows per text
    val textA = "a1 a2 a3 a4 a5 a6 a7 a8 a9"
    val textB = "b1 b2 b3 b4 b5 b6 b7 b8 b9"
    TextOps.spanKeysOf(Seq((1L, textA)).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(keysPath)

    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    // refreshEvery = 2 → the key set reloads on batches 0, 2, 4, …
    val q = SpanStream.spansVsCorpusRefreshing(stream, keysPath, refreshEvery = 2) {
      (df, bid) =>
        val rows = df.select("doc_id", "n_dup_spans", "dup_tokens").collect()
        hits.synchronized {
          rows.foreach(r => hits += ((bid, r.getLong(1), r.getLong(2))))
        }
    }.start()
    try {
      // batch 0 (refresh): a re-serve of corpus text A is one full span
      mem.addData((9001L, textA))
      q.processAllAvailable()
      // corpus addition lands on storage between batches — at the FILE
      // level, the way a separate ingest process delivers it (a
      // same-session write would auto-recache via refreshByPath and
      // defeat the staleness half of this test)
      val side = java.nio.file.Files.createTempDirectory("graft-spankeys-add").toString
      TextOps.spanKeysOf(Seq((2L, textB)).toDF("doc_id", "text"))
        .coalesce(1).write.mode("overwrite").parquet(side)
      val part = new java.io.File(side).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(keysPath, part.getName))
      // batch 1 (no refresh): the snapshot is stale — text B has no spans
      mem.addData((9002L, textB))
      q.processAllAvailable()
      // batch 2 (refresh): the same text is now one 9-token span
      mem.addData((9003L, textB))
      q.processAllAvailable()
    } finally q.stop()

    assert(hits.toSeq == Seq((0L, 1L, 9L), (2L, 1L, 9L)), s"got $hits")
  }
}
