package graft.streaming

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.TestSpark

/** Drained-stream ≡ batch for the OOV drift monitor: per-(window, lang)
  * token/OOV counts match a naive per-minute recompute against the same
  * vocabulary, and rows only emit once their window closes.
  */
class VocabDriftSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  type Doc = (Long, String, String, Timestamp)

  private val t0 = 1704067200000L // 2024-01-01 00:00:00 UTC

  test("drained oov stream equals the naive per-minute recompute") {
    // vocabulary corpus: 'good' terms dominate; vocab = top-3
    val corpus = Seq.tabulate(20)(i => (i.toLong, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val vocab = VocabDrift.corpusVocab(corpus, 3)
    assert(vocab.count() === 3)

    // stream: minute 0 clean, minute 1 drifting (junk terms), two langs
    val docs: Seq[Doc] = Seq(
      (1L, "alpha beta gamma alpha", "en", new Timestamp(t0 + 1000)),
      (2L, "alpha beta", "de", new Timestamp(t0 + 20000)),
      (3L, "alpha junk1 junk2", "en", new Timestamp(t0 + 61000)),
      (4L, "junk3 junk4 junk5 beta", "de", new Timestamp(t0 + 95000)),
      (5L, null, "en", new Timestamp(t0 + 96000)))
    // sentinel an hour later: closes every earlier window, its own stays
    // open and must NOT emit
    val sentinel: Doc = (99L, "alpha", "zz", new Timestamp(t0 + 3600000))

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Doc]
    val stream = mem.toDS.toDF("doc_id", "text", "lang", "time")
    val q = VocabDrift.oovStream(stream, vocab, bucket = "1 minute",
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("oov_drift")
      .outputMode("append").start()
    try {
      mem.addData(docs: _*)
      q.processAllAvailable()
      mem.addData(sentinel)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("oov_drift")
      .as[(Timestamp, String, Long, Long, Double)].collect().toSet
    val inVocab = Set("alpha", "beta", "gamma")
    val expected = docs.filter(_._2 != null)
      .flatMap { case (_, t, l, ts) =>
        t.split(" ").map(w => ((ts.getTime - t0) / 60000, l, w))
      }
      .groupBy { case (m, l, _) => (m, l) }
      .map { case ((m, l), toks) =>
        val total = toks.size.toLong
        val oov = toks.count(t => !inVocab(t._3)).toLong
        (new Timestamp(t0 + m * 60000), l, total, oov, oov.toDouble / total)
      }.toSet
    assert(got == expected, s"got=$got expected=$expected")
    assert(!got.exists(_._2 == "zz"), "open window must not emit")
  }
}
