package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** DSIR importance selection + quality-gate funnel vs naive driver-side
  * recomputes of their definitions, on corpora engineered to hit the
  * boundary semantics (zero target overlap, target-only docs, null/empty
  * texts, every funnel stage rejecting someone).
  */
class DsirFunnelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5Uniform(salt: String, id: Long): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt$id".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  private def randCorpus(seed: Long, n: Int): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    // two vocab registers: target-flavored and raw-flavored, with overlap
    val tv = Vector("alpha", "beta", "gamma", "delta", "shared", "common")
    val rv = Vector("spam", "junk", "click", "buy", "shared", "common")
    (0 until n).map { i =>
      val src = s"src${rnd.nextInt(4)}"
      val v = if (src == "src0") tv else rv
      val text = (0 until (3 + rnd.nextInt(12)))
        .map(_ => v(rnd.nextInt(v.size))).mkString(" ")
      (i.toLong, text, src)
    }
  }

  test("dsir weights equal the naive two-corpus unigram LM ratio") {
    for (seed <- 1L to 3L) {
      val corpus = randCorpus(seed, 120)
      val df = corpus.toDF("doc_id", "text", "source")
      val got = TextOps.dsirSelectOver(df, "src0", 0.5).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
        .toMap

      // naive recompute mirroring the declared arithmetic chain
      val toks = corpus.map { case (id, t, s) => (id, s, t.split(" ", -1).toSeq) }
      val cT = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      val cR = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      toks.foreach { case (_, s, ts) =>
        ts.foreach(t => if (s == "src0") cT(t) += 1 else cR(t) += 1)
      }
      val tt = cT.values.sum
      val tr = cR.values.sum
      val cands = toks.filter(_._2 != "src0")
      assert(got.size === cands.size)
      cands.foreach { case (id, _, ts) =>
        val sT = ts.map(t => BigInt(cT(t))).sum
        val sR = ts.map(t => BigInt(cR(t))).sum
        val w = (sT.toDouble * tr.toDouble) / (sR.toDouble * tt.toDouble)
        val (nTok, gw, sel) = got(id)
        assert(nTok === ts.size.toLong)
        assert(gw === w, s"doc $id")
        assert(sel === (md5Uniform("dsir:", id) < 0.5 * w), s"doc $id")
      }
    }
  }

  test("dsir boundary semantics: target excluded, zero-overlap weight is 0") {
    val df = Seq(
      (1L, "alpha beta", "src0"),      // target — must not appear
      (2L, "alpha beta", "src1"),      // full target overlap
      (3L, "zzz qqq", "src1")          // zero target overlap → weight 0
    ).toDF("doc_id", "text", "source")
    val rows = TextOps.dsirSelectOver(df, "src0", 0.5).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 3L))
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getDouble(2) === 0.0)
    assert(!byId(3L).getBoolean(3)) // weight 0 can never be selected
    assert(byId(2L).getDouble(2) > 0.0)
  }

  test("funnel stages match the naive per-rule recompute and compose") {
    val docs = Seq[(Long, String)](
      (1L, null),                                   // fails has_text
      (2L, "a b"),                                  // fails min_tokens
      (3L, Seq.fill(12)("ab").mkString(" ")),       // fails avg_tok_len_min
      (4L, Seq.fill(12)("abcdefghijklmnopqrst").mkString(" ")), // fails max
      (5L, Seq.fill(12)("abcd").mkString(" ")),     // reaches hash gate
      (6L, Seq.fill(15)("wxyz").mkString(" ")),     // reaches hash gate
      (7L, Seq.fill(20)("lmno").mkString(" "))      // reaches hash gate
    ).toDF("doc_id", "text")
    val rows = TextOps.filterFunnelOver(docs).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq === Seq(
      (1L, "has_text"), (2L, "min_tokens"), (3L, "avg_tok_len_min"),
      (4L, "avg_tok_len_max"), (5L, "hash_gate")))
    // funnel algebra: n_out(i) == n_in(i+1), n_in - n_fail == n_out
    rows.foreach(r => assert(r.getLong(2) - r.getLong(3) === r.getLong(4)))
    rows.sliding(2).foreach { case Array(a, b) => assert(a.getLong(4) === b.getLong(2)) }
    assert(rows(0).getLong(2) === 7L)
    assert(rows(0).getLong(3) === 1L) // doc 1
    assert(rows(1).getLong(3) === 1L) // doc 2
    assert(rows(2).getLong(3) === 1L) // doc 3
    assert(rows(3).getLong(3) === 1L) // doc 4
    // survivors of the hash gate == corpusGates' own yield on the corpus
    val gateN = TextOps.corpusGates(docs).count()
    assert(rows(4).getLong(4) === gateN)
  }

  test("funnel totals match corpus gates on a random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "ab", "abc", "abcd", "abcdefghij", "")
    val docs = (0 until 300).map { i =>
      val text =
        if (rnd.nextDouble() < 0.05) null
        else (0 until rnd.nextInt(25))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val rows = TextOps.filterFunnelOver(docs).collect()
    rows.sliding(2).foreach { case Array(a, b) => assert(a.getLong(4) === b.getLong(2)) }
    assert(rows.last.getLong(4) === TextOps.corpusGates(docs).count())
  }

  test("budget selection equals the naive sort-and-scan on a random corpus") {
    val rnd = new scala.util.Random(31)
    val stop = Seq("the", "of", "and", "to")
    val docs = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(30)
      val text = (0 until n)
        .map(_ => if (rnd.nextDouble() < 0.3) stop(rnd.nextInt(stop.size))
                  else s"w${rnd.nextInt(50)}")
        .mkString(" ")
      (i.toLong, text)
    }
    val budget = 800L
    val got = TextOps.budgetSelectOver(docs.toDF("doc_id", "text"), budget)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // naive: sort by (stop ratio desc, id), running total, keep while
    // the running total BEFORE the doc is under budget
    val ranked = docs.map { case (id, text) =>
      val tk = text.split(" ", -1).toSeq
      val ratio = tk.count(stop.contains).toDouble / tk.size
      (id, tk.size.toLong, ratio)
    }.sortBy { case (id, _, r) => (-r, id) }
    var cum = 0L
    ranked.foreach { case (id, n, _) =>
      val (gn, gc, gk) = got(id)
      assert(gn === n, s"doc $id n_tokens")
      assert(gc === cum, s"doc $id cum")
      assert(gk === (cum < budget), s"doc $id kept")
      cum += n
    }
    // the straddling document is kept: kept tokens reach the budget
    val keptTokens = got.values.collect { case (n, _, true) => n }.sum
    assert(keptTokens >= budget)
    assert(got.values.count(_._3) < docs.size) // and something was dropped
  }
}
