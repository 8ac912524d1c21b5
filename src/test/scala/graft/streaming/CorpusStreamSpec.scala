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

  test("drained mix stream equals batch mix gates + first-arrival dedup") {
    val base = graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long"), col("text"), col("lang"),
        col("n_chars").cast("long"))
      .as[(Long, String, String, Long)].collect().sortBy(_._1)

    // batch-side artifacts a production pipeline would refresh
    // periodically: the eval-gram hash set (from the first doc, our
    // stand-in benchmark) and per-language temperature thresholds
    val evalGrams = TextOps.evalGramHashesOf(
      Seq(base.head._2).toDF("text"))
    val thresholds = base.groupBy(_._3).map { case (lang, docs) =>
      lang -> math.min(1.0, 3.0 / math.sqrt(docs.length.toDouble))
    }

    // inject: exact copies (dedup must drop), a doc of pure repetition
    // (repetition gate must drop), and a doc lifted from the eval text
    // (decontamination must drop)
    val copies = base.slice(1, 15).map { case (id, t, l, n) => (id + 200000L, t, l, n) }
    val repetitive = (300000L, Array.fill(40)("spam").mkString(" "), "en", 160L)
    val contaminated = (300001L, base.head._2, "en", base.head._4)
    val all: Seq[Doc] =
      (base.drop(1) ++ copies ++ Seq(repetitive, contaminated)).zipWithIndex
        .map { case ((id, t, l, n), i) =>
          (id, t, l, n, new Timestamp(1704067200000L + i * 1000L))
        }

    val gated = TextOps.mixGates(
      all.toDF("doc_id", "text", "lang", "n_chars", "time"),
      evalGrams, thresholds)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)].collect()
    assert(gated.exists(_._1 >= 200000L)) // some copies pass the gates…
    assert(!gated.exists(_._1 >= 300000L)) // …but the injected bad docs don't
    val expected = gated.groupBy(_._2).map { case (_, rows) =>
      val keep = rows.minBy(_._1) // copies arrive after originals
      (keep._1, keep._3)
    }.toSet
    assert(expected.nonEmpty)

    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Doc]
    val stream = mem.toDS.toDF("doc_id", "text", "lang", "n_chars", "time")
    val q = CorpusStream.mixStream(stream, evalGrams, thresholds)
      .writeStream.format("memory").queryName("corpus_mix_stream")
      .outputMode("append").start()
    try {
      val (first, second) = all.splitAt(all.size / 2)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(second: _*)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("corpus_mix_stream")
      .as[(Long, String)].collect().toSet
    assert(got == expected)
  }

  test("mix stream restart: dedup state survives the checkpoint") {
    import java.nio.file.{Files, Paths}
    val in = Files.createTempDirectory("graft_mix_in").toString
    val outDir = Files.createTempDirectory("graft_mix_out").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_mix_ckpt").toString

    def row(id: Long, text: String, lang: String, sec: Int): String =
      s"""{"doc_id":$id,"text":"$text","lang":"$lang","n_chars":${text.length},""" +
        s""""time":"2024-01-01T00:00:${f"$sec%02d"}.000Z"}"""

    // no decontamination/threshold gating in this case — isolate the
    // dedup-state-restore behavior
    val schema = "doc_id LONG, text STRING, lang STRING, n_chars LONG, time TIMESTAMP"
    def start() = {
      val parsed = spark.readStream.schema(schema).json(in)
      CorpusStream.mixStream(parsed, evalGramHashes = Seq.empty,
        thresholds = Map.empty, watermark = "1 hour")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }

    Files.writeString(Paths.get(s"$in/a.json"),
      row(1, "alpha beta gamma delta epsilon", "en", 1) + "\n" +
        row(2, "one two three four five", "de", 2) + "\n")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(outDir).count() == 2)

    // while down: an exact copy of doc 1 (state must still drop it after
    // restart), one fresh doc, and one pure-repetition doc (gate drops it)
    Files.writeString(Paths.get(s"$in/b.json"),
      row(10, "alpha beta gamma delta epsilon", "en", 10) + "\n" +
        row(11, "six seven eight nine ten", "fr", 11) + "\n" +
        row(12, "spam spam spam spam spam", "en", 12) + "\n")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "en"), (2L, "de"), (11L, "fr")))
  }
}
