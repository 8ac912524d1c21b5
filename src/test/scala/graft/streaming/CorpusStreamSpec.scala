package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.operators.TextOps

/** Drained-stream ≡ batch for the streaming corpus manifest: same gates,
  * and exact dups collapse to the first (lowest doc_id) arrival.
  */
class CorpusStreamSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  type Doc = (Long, String, String, Long, Timestamp)

  test("drained manifest equals batch gates + first-arrival exact dedup") {
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"), col("lang"),
        col("n_chars").cast("long"))
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    // inject exact copies under new ids — the stream must keep only the
    // first arrival of each content fingerprint that passes the gates
    val copies = base.take(20).map { case (id, t, l, n) => (id + 100000L, t, l, n) }
    val all: Seq[Doc] = (base ++ copies).zipWithIndex.map { case ((id, t, l, n), i) =>
      (id, t, l, n, new Timestamp(1704067200000L + i * 1000L))
    }

    // batch expectation: gates pass-set, then min passing doc_id per text
    // (the corpus has no intra-batch exact dups, so first-arrival ==
    // min-id here; copies always arrive after their originals)
    val gated = TextOps.corpusGates(
      all.toDF("doc_id", "text", "lang", "n_chars", "time"))
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .as[(Long, String, String, Long)]
      .collect()
    val expected = gated.groupBy(_._2).map { case (_, rows) =>
      val keep = rows.minBy(_._1)
      (keep._1, keep._3, keep._4)
    }.toSet
    assert(expected.nonEmpty)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Doc]
    val stream = mem.toDS.toDF("doc_id", "text", "lang", "n_chars", "time")
    val q = CorpusStream.manifest(stream)
      .writeStream.format("memory").queryName("corpus_manifest")
      .outputMode("append").start()
    try {
      val (first, second) = all.splitAt(all.size / 2)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(second: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("corpus_manifest")
      .as[(Long, String, Long)].collect().toSet
    assert(got == expected)
  }
}
