package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.{MediaHashIndex, MultimodalOps}

/** Streaming media near-dup vs corpus history: the kernel is stateless,
  * so a fully-drained stream must emit exactly the batch run of the same
  * code; the maintained-artifact serving path honors the refresh-boundary
  * consistency model; and the ingest maintainer converges on the full
  * rebuild's hash set with bounded segment counts.
  */
class MediaStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  /** Corpus = two thirds of the documents; the "new batch" is built the
    * way a real ingest produces near-dups: re-crawled copies of corpus
    * documents under fresh ids (identical text ⇒ identical tiled pixels
    * ⇒ Hamming 0 — guaranteed hits, never a vacuous drain).
    */
  private def corpusDocs = graft.Tables.documents(spark, dir)
    .select("doc_id", "text").filter(col("doc_id") % 3 =!= 0)

  private def recrawl(): Seq[(Long, String)] =
    graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 7 === 0)
      .select(col("doc_id") + 100000L, col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

  test("drained stream-vs-index hits equal the batch run of the same kernel") {
    val root = java.nio.file.Files.createTempDirectory("graft-mediastream").toString
    MediaHashIndex.buildInto(root,
      MultimodalOps.imageHashesOf(corpusDocs), MediaHashIndex.Image.family)
    val streamRows = recrawl()
    assert(streamRows.nonEmpty)

    val expected = MediaStream.matchesVsCorpus(
        streamRows.toDF("doc_id", "text"),
        MediaHashIndex.load(spark, root, MediaHashIndex.Image.family),
        MediaHashIndex.Image)
      .as[(Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty, "no stream-vs-corpus near-dups; test is vacuous")
    // every re-crawled copy must at least hit its own parent at Hamming 0
    assert(streamRows.map(_._1).toSet.subsetOf(expected.map(_._1).toSet))

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val q = MediaStream.matchesVsIndexRefreshing(
        stream, root, MediaHashIndex.Image, refreshEvery = 2) { (df, _) =>
      val rows = df.as[(Long, Long, Long)].collect()
      got.synchronized { got ++= rows }: Unit
    }.start()
    try {
      val (first, second) = streamRows.splitAt(streamRows.length / 2)
      mem.addData(first.toSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet === expected)
  }

  test("maintainer appends become visible at the refresh boundary") {
    val root = java.nio.file.Files.createTempDirectory("graft-mediarefresh").toString
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").filter(col("doc_id") % 3 =!= 0)
    val (histIds, newIds) = (docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0))
    MediaHashIndex.buildInto(root,
      MultimodalOps.imageHashesOf(histIds), MediaHashIndex.Image.family)
    // one probe that re-crawls a HISTORY doc, one that re-crawls a doc
    // only the mid-stream append will hold
    val histProbe = histIds.select(col("doc_id") + 100000L, col("text"))
      .as[(Long, String)].head()
    val newProbe = newIds.select(col("doc_id") + 100000L, col("text"))
      .as[(Long, String)].head()

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = MediaStream.matchesVsIndexRefreshing(
        stream, root, MediaHashIndex.Image, refreshEvery = 1) { (df, bid) =>
      val rows = df.select("media_id").distinct().as[Long].collect()
      hits.synchronized { rows.foreach(r => hits += ((bid, r))) }: Unit
    }.start()
    try {
      // batch 0: the history re-crawl hits the artifact; the new-doc
      // re-crawl finds nothing (its parent is not indexed yet)
      mem.addData(histProbe, newProbe)
      q.processAllAvailable()
      // the maintainer folds the other half in (a crash-swap-protected
      // append mid-stream) — visible at the next refresh boundary
      MediaHashIndex.appendTo(root, MultimodalOps.imageHashesOf(newIds),
        MediaHashIndex.Image.family)
      mem.addData(newProbe)
      q.processAllAvailable()
    } finally q.stop()
    val hit = hits.toSet
    assert(hit.contains((0L, histProbe._1)), s"got $hits")
    assert(!hit.contains((0L, newProbe._1)), s"got $hits")
    assert(hit.exists(h => h._1 > 0L && h._2 == newProbe._1), s"got $hits")
  }

  test("appendStream maintains the artifact: drained ingest equals a full " +
      "rebuild's hash set; shard-local auto-compaction bounds segments") {
    val root = java.nio.file.Files.createTempDirectory("graft-mediaappend").toString
    val all = graft.Tables.documents(spark, dir).select("doc_id", "text")
    val rows = all.as[(Long, String)].collect().sortBy(_._1)
    val (base, incoming) = rows.splitAt(rows.length / 3)
    MediaHashIndex.buildInto(root,
      MultimodalOps.imageHashesOf(base.toSeq.toDF("doc_id", "text")),
      MediaHashIndex.Image.family)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDS.select(col("_1").as("doc_id"), col("_2").as("text"))
    val q = MediaStream.appendStream(stream, root, MediaHashIndex.Image,
      maxSegments = 2).start()
    try {
      incoming.grouped(math.max(incoming.length / 4, 1)).foreach { slice =>
        mem.addData(slice.toSeq: _*)
        q.processAllAvailable()
        assert(MediaHashIndex.segments(root) <= 3,
          s"segment bound violated: ${MediaHashIndex.segments(root)}")
      }
    } finally q.stop()
    MediaHashIndex.compact(root, spark, MediaHashIndex.Image.family)
    spark.catalog.refreshByPath(MediaHashIndex.hashesDir(root))
    val got = MediaHashIndex.load(spark, root, MediaHashIndex.Image.family)
      .as[(Long, Long)].collect().toSet
    val want = MultimodalOps.imageHashesOf(all)
      .as[(Long, Long)].collect().toSet
    assert(got === want)
  }
}
