package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Perplexity bucketing, OOV rate, top-ngram mining and BM25 retrieval vs
  * naive driver-side recomputes of their exact declared arithmetic, on
  * corpora engineered for the boundary semantics (null/empty texts, docs
  * shorter than the gram window, rank ties, query terms absent from a
  * document).
  */
class RetrievalStatsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def randCorpus(seed: Long, n: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val v = Vector("spark", "query", "join", "hash", "table", "scan",
      "dup", "merge", "stream", "row", "batch", "the", "a")
    val langs = Vector("en", "de", "fr")
    (0 until n).map { i =>
      val text =
        if (i % 17 == 0) null
        else if (i % 13 == 0) "" // one empty-string token on split
        else (0 until (2 + rnd.nextInt(14)))
          .map(_ => v(rnd.nextInt(v.size))).mkString(" ")
      (i.toLong, text, langs(rnd.nextInt(langs.size)))
    }
  }

  private def toks(t: String): Seq[String] = t.split(" ", -1).toSeq

  test("perplexity buckets: exact lm chain, permutation rank, tercile formula") {
    for (seed <- 1L to 3L) {
      val corpus = randCorpus(seed, 90)
      val df = corpus.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
      val got = TextOps.perplexityBucketsOver(df, s"spec-perp:$seed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))

      // naive: unigram counts, exact-integer sum, the same division chain
      val scored = corpus.filter(_._2 != null)
      val cnt = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      scored.foreach { case (_, t, _) => toks(t).foreach(cnt(_) += 1L) }
      val total = cnt.values.sum
      val per = scored.map { case (id, t, _) =>
        val ts = toks(t)
        val sumTf = ts.groupBy(identity).map { case (w, ws) =>
          BigInt(ws.size.toLong) * BigInt(cnt(w))
        }.sum
        val prob = (sumTf.toDouble / ts.size.toDouble) / total.toDouble
        (id, ts.size.toLong, prob)
      }
      val ranked = per.sortBy { case (id, _, p) => (-p, id) }.zipWithIndex
        .map { case ((id, nt, p), i) =>
          val rank = i + 1L
          (id, (nt, p, rank, ((rank - 1) * 3) / per.size + 1L))
        }.toMap
      assert(got.length === per.size)
      assert(got.map(_._4).sorted === (1L to per.size.toLong))
      got.foreach { case (id, nt, p, rank, bucket) =>
        val (eNt, eP, eRank, eBucket) = ranked(id)
        assert(nt === eNt, s"doc $id n_tokens")
        assert(p === eP, s"doc $id avg_prob")
        assert(rank === eRank, s"doc $id rank")
        assert(bucket === eBucket, s"doc $id bucket")
      }
    }
  }

  test("oov rate: top-v vocab by (count desc, term), exact counts per lang") {
    for (seed <- 4L to 6L) {
      val corpus = randCorpus(seed, 80)
      val df = corpus.toDF("doc_id", "text", "lang")
      val v = 4
      val got = TextOps.oovRateOver(df, v, s"spec-oov:$seed:$v").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap

      val scored = corpus.filter(_._2 != null)
      val cnt = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      scored.foreach { case (_, t, _) => toks(t).foreach(cnt(_) += 1L) }
      val vocab = cnt.toSeq.sortBy { case (w, c) => (-c, w) }.take(v).map(_._1).toSet
      val byLang = scored.groupBy(_._3)
      assert(got.keySet === byLang.keySet)
      byLang.foreach { case (lang, docs) =>
        val all = docs.flatMap(d => toks(d._2))
        val oov = all.count(w => !vocab(w)).toLong
        val (gTot, gOov, gRate) = got(lang)
        assert(gTot === all.size.toLong, s"$lang total")
        assert(gOov === oov, s"$lang oov")
        assert(gRate === oov.toDouble / all.size.toDouble, s"$lang rate")
      }
    }
  }

  test("top ngrams: occurrence/reach counts; sub-window docs carry no gram") {
    for (seed <- 7L to 9L) {
      val corpus = randCorpus(seed, 70)
      val df = corpus.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
      val (n, k) = (5, 15)
      val got = TextOps.topNgramsOver(df, n, k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

      def grams(t: String): Seq[String] = {
        val tk = toks(t)
        // sub-window docs carry no n-gram (the operator's contract)
        if (tk.size < n) Seq.empty
        else tk.sliding(n).map(_.mkString(" ")).toSeq
      }
      val occ = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val reach = scala.collection.mutable.Map[String, Set[Long]]().withDefault(_ => Set())
      corpus.filter(_._2 != null).foreach { case (id, t, _) =>
        grams(t).foreach { g => occ(g) += 1L; reach(g) = reach(g) + id }
      }
      val expect = occ.toSeq
        .map { case (g, c) => (g, c, reach(g).size.toLong) }
        .sortBy { case (g, c, d) => (-c, -d, g) }
        .take(k)
      assert(got.toSeq === expect)
    }
  }

  test("rag chunks: window/stride boundaries match the naive chunker") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 2 chunks, 2nd clamps
      (2L, (1 to 4).map(i => s"t$i").mkString(" ")), // exactly one window
      (3L, "solo"), // single token
      (4L, ""), // one empty token on split
      (5L, null: String), // excluded
      (6L, (1 to 9).map(i => s"t$i").mkString(" "))) // start 7 hits last 3
      .toDF("doc_id", "text")
    val (window, stride) = (4, 3)
    val got = TextOps.ragChunksOver(docs, window, stride).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val expect = Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2L, "t1 t2 t3 t4"),
      (3L, "solo"), (4L, ""), (6L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"))
      .flatMap { case (id, t) =>
        val tk = t.split(" ", -1)
        // starts stop once a window reaches the end: no chunk fully
        // contained in its predecessor (doc 1 at n=10/w=4/s=3 emits
        // starts 1,4,7 — NOT 10, whose [t10] is inside chunk 7..10)
        (1 to math.max(1, tk.length - (window - stride)) by stride)
          .zipWithIndex.map { case (s, i) =>
            val chunk = tk.slice(s - 1, s - 1 + window)
            (id, i + 1L, s.toLong, chunk.length.toLong, chunk.mkString(" "))
          }
      }.sortBy(x => (x._1, x._2))
    assert(got.toSeq === expect)
  }

  test("chunking applies to a stream unchanged (drained ≡ batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "a b"), (3L, null: String))
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = TextOps.ragChunkRows(mem.toDS.toDF("doc_id", "text"), 4, 3)
      .writeStream.format("memory").queryName("rag_chunk_stream")
      .outputMode("append").start()
    try { mem.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    val got = spark.table("rag_chunk_stream").collect()
      .map(_.toString).toSet
    val batch = TextOps.ragChunkRows(docs.toDF("doc_id", "text"), 4, 3)
      .collect().map(_.toString).toSet
    assert(got.nonEmpty && got === batch)
  }

  test("bm25: positional-slot scores match the naive fixed double chain") {
    for (seed <- 10L to 12L) {
      val corpus = randCorpus(seed, 100)
      val df = corpus.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
      val k = 7
      val got = TextOps.bm25TopKOver(df, k, s"spec-bm25:$seed").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

      val scored = corpus.filter(_._2 != null)
        .map { case (id, t, _) => id -> toks(t) }
      val n = scored.size.toLong
      val t = scored.map(_._2.size.toLong).sum
      val tf = scored.map { case (id, ts) =>
        id -> ts.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      }.toMap
      val queries = TextOps.bm25Queries.groupBy(_._1)
      val expect = queries.toSeq.flatMap { case (qid, terms) =>
        val byPos = terms.sortBy(_._2)
        def s(id: Long, term: String): Option[Double] =
          tf(id).get(term).map { f =>
            val df0 = scored.count { case (_, ts) => ts.contains(term) }.toLong
            val idf = (2L * n - 2L * df0 + 1L).toDouble / (2L * df0 + 1L).toDouble
            val dl = scored.find(_._1 == id).get._2.size.toLong
            val norm = dl.toDouble / (t.toDouble / n.toDouble)
            idf * ((f.toDouble * 2.2) / (f.toDouble + 1.2 * (0.25 + 0.75 * norm)))
          }
        val perDoc = scored.map(_._1).distinct.flatMap { id =>
          val parts = byPos.map { case (_, _, term) => s(id, term) }
          if (parts.forall(_.isEmpty)) None
          else Some((id, parts.map(_.getOrElse(0.0)).reduceLeft(_ + _)))
        }
        perDoc.sortBy { case (id, sc) => (-sc, id) }.take(k).zipWithIndex
          .map { case ((id, sc), i) => (qid, i + 1L, id, sc) }
      }.sortBy { case (qid, rank, _, _) => (qid, rank) }
      assert(got.toSeq === expect)
    }
  }
}
