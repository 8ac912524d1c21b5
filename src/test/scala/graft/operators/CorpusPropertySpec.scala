package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Randomized equivalence for the corpus-construction family: generated
  * corpora (including empty texts, runs of spaces → empty tokens, and
  * single-token docs) must agree exactly with naive driver-side
  * recomputes of each definition. This is the guard on the row-wise
  * formulations (sort+fold mode, bindOnce gram builders, distributed
  * prefix sum): any boundary slip in the array arithmetic shows up here
  * before it shows up at corpus scale.
  */
class CorpusPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def randCorpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "b", "ab", "ba", "xyz", "q", "")
    (0 until nDocs).map { i =>
      val text =
        if (rnd.nextDouble() < 0.05) "" // empty text → one empty token
        else (0 until (1 + rnd.nextInt(30)))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text)
    }
  }

  test("repetition signals equal the naive definition on random corpora") {
    for (seed <- 1L to 3L) {
      val docs = randCorpus(seed, 150)
      val got = TextOps.repetitionOver(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val want = docs.map { case (id, text) =>
        val toks = text.split(" ", -1).toSeq
        val bgs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        id -> ((toks.size.toLong, toks.distinct.size.toLong,
          toks.groupBy(identity).values.map(_.size).max.toLong,
          if (bgs.isEmpty) 0L else bgs.groupBy(identity).values.map(_.size).max.toLong))
      }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("chunk dedup equals the naive definition on random corpora") {
    for (seed <- 4L to 6L) {
      val docs = randCorpus(seed, 150)
      val got = TextOps.chunkDedupOver(docs.toDF("doc_id", "text"), chunkTokens = 4)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val chunked = docs.map { case (id, text) =>
        id -> text.split(" ", -1).grouped(4).map(_.mkString(" ")).toSet
      }
      val firstOwner = chunked.flatMap { case (id, cs) => cs.map(_ -> id) }
        .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }
      val want = chunked.map { case (id, cs) =>
        id -> ((cs.size.toLong, cs.count(c => firstOwner(c) < id).toLong))
      }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("sequence packing equals the naive running count on random corpora") {
    for (seed <- 7L to 9L) {
      val docs = randCorpus(seed, 150)
      val got = TextOps.packSequencesOver(docs.toDF("doc_id", "text"),
        seqLen = 16, numParts = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      var cum = 0L
      val want = docs.sortBy(_._1).map { case (id, text) =>
        val n = text.split(" ", -1).length.toLong
        val row = (id, n, cum / 16, (cum + n - 1) / 16, cum % 16)
        cum += n
        row
      }
      assert(got.toSeq == want, s"seed=$seed")
    }
  }

  test("merge pairs equal the naive definition on random corpora") {
    for (seed <- 10L to 12L) {
      val docs = randCorpus(seed, 150)
      val got = TextOps.mergePairsOver(docs.toDF("doc_id", "text"), k = 8)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val want = docs
        .flatMap(d => d._2.split(" ", -1).sliding(2).filter(_.size == 2)
          .map(_.mkString(" ")))
        .groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
        .toSeq.sortBy { case (p, n) => (-n, p) }.take(8)
      assert(got.toSeq == want, s"seed=$seed")
    }
  }
}
