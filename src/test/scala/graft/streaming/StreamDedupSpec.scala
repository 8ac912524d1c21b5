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
    val expected = TextOps.minhashLsh(spark, dir)
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
}
