package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Winnowing selection against a naive single-node reference (same
  * hashes, straight loop), the paper's guarantee on constructed
  * shared-substring pairs, and the overlap matcher's df gate.
  */
class WinnowPropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The operator's hash: first 15 md5 hex chars as a 60-bit long. */
  private def h60(gram: String): Long =
    java.lang.Long.parseLong(md5hex(gram).substring(0, 15), 16)

  /** Spark's `xxhash64` on a string column: XXH64 over the UTF-8 bytes
    * with seed 42 — the production-tier gram hash.
    */
  private def hXx(gram: String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
      org.apache.spark.unsafe.types.UTF8String.fromString(gram), 42L)

  /** Naive winnowing: k-gram hashes, each w-window's min with rightmost
    * tie, distinct (pos, fp). Positions 1-based like the operator.
    * `h` is the gram-hash family under test — the algorithm (and the
    * guarantee) must hold under ANY total order on hashes.
    */
  private def naive(tokens: Seq[String], k: Int, w: Int,
      h: String => Long = h60): Set[(Long, Long)] = {
    if (tokens.size < k + w - 1) return Set.empty
    val hs = (0 to tokens.size - k)
      .map(i => h(tokens.slice(i, i + k).mkString(" ")))
    (0 to hs.size - w).flatMap { j =>
      var bestV = Long.MaxValue; var bestP = 0
      for (o <- 0 until w) {
        val v = hs(j + o)
        if (v <= bestV) { bestV = v; bestP = j + o }
      }
      Some(((bestP + 1).toLong, bestV))
    }.toSet
  }

  private def rnd(seed: Long) = new scala.util.Random(seed)

  test("selection equals the naive reference on randomized corpora") {
    val docs = (0 until 40).map { i =>
      val r = rnd(1000 + i)
      val n = 2 + r.nextInt(40) // includes sub-window documents
      (i.toLong, Seq.fill(n)(s"w${r.nextInt(12)}").mkString(" "))
    }
    val got = TextOps.winnowOver(docs.toDF("doc_id", "text"), 3, 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) =>
        d -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet
      }
    docs.foreach { case (id, text) =>
      val want = naive(text.split(" ").toSeq, 3, 4)
      assert(got.getOrElse(id, Set.empty) === want, s"doc $id")
    }
  }

  test("xxhash64 tier: selection equals the naive reference on randomized corpora") {
    // same corpora class as the md5 test — pins that the PRODUCTION
    // family changes only hash values, never the selection structure
    val docs = (0 until 40).map { i =>
      val r = rnd(3000 + i)
      val n = 2 + r.nextInt(40)
      (i.toLong, Seq.fill(n)(s"x${r.nextInt(12)}").mkString(" "))
    }
    val got = TextOps.winnowOver(docs.toDF("doc_id", "text"), 3, 4,
        TextOps.WinnowXx)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) =>
        d -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet
      }
    docs.foreach { case (id, text) =>
      val want = naive(text.split(" ").toSeq, 3, 4, hXx)
      assert(got.getOrElse(id, Set.empty) === want, s"doc $id")
    }
  }

  test("xxhash64 tier: guarantee and density hold on random corpora") {
    // guarantee: 30 planted shared runs of exactly w+k-1 tokens
    (0 until 30).foreach { i =>
      val r = rnd(8000 + i)
      val shared = Seq.fill(6)(s"s${i}y${r.nextInt(1000)}")
      def doc(tag: String) = {
        val pre = Seq.fill(1 + r.nextInt(10))(s"$tag${r.nextInt(1000)}")
        val post = Seq.fill(1 + r.nextInt(10))(s"$tag${r.nextInt(1000)}")
        pre ++ shared ++ post
      }
      val fa = naive(doc("a"), 3, 4, hXx).map(_._2)
      val fb = naive(doc("b"), 3, 4, hXx).map(_._2)
      assert(fa.intersect(fb).nonEmpty, s"pair $i shares no fingerprint")
    }
    // density: near 2/(w+1) of the gram count, like the oracle tier
    val r = rnd(142)
    val toks = Seq.fill(5000)(s"u${r.nextInt(5000)}")
    val frac = naive(toks, 3, 4, hXx).size.toDouble / (toks.size - 2)
    assert(frac > 0.25 && frac < 0.55, s"density $frac")
  }

  test("selection equals the naive reference across a (k, w) grid and both families") {
    // the r9 parameterization claims family- AND parameter-independence
    // of the selection STRUCTURE; pin it on a grid, not just (3, 4)
    val grid = Seq((2, 2), (2, 5), (4, 3), (5, 2))
    val families = Seq(
      (TextOps.WinnowMd5, h60 _), (TextOps.WinnowXx, hXx _))
    val docs = (0 until 12).map { i =>
      val r = rnd(4000 + i)
      val n = 2 + r.nextInt(30)
      (i.toLong, Seq.fill(n)(s"g${r.nextInt(10)}").mkString(" "))
    }
    for ((k, w) <- grid; (fam, h) <- families) {
      val got = TextOps.winnowOver(docs.toDF("doc_id", "text"), k, w, fam)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (d, rs) =>
          d -> rs.map(r => (r.getLong(1), r.getLong(2))).toSet
        }
      docs.foreach { case (id, text) =>
        val want = naive(text.split(" ").toSeq, k, w, h)
        assert(got.getOrElse(id, Set.empty) === want,
          s"doc $id under (k=$k, w=$w, ${fam.name})")
      }
    }
  }

  test("guarantee: a shared token run of length >= w+k-1 shares a fingerprint") {
    // 30 pairs, each sharing a planted run of exactly w+k-1 = 6 tokens
    // at random offsets inside otherwise-disjoint vocabularies
    (0 until 30).foreach { i =>
      val r = rnd(7000 + i)
      val shared = Seq.fill(6)(s"s${i}x${r.nextInt(1000)}")
      def doc(tag: String) = {
        val pre = Seq.fill(1 + r.nextInt(10))(s"$tag${r.nextInt(1000)}")
        val post = Seq.fill(1 + r.nextInt(10))(s"$tag${r.nextInt(1000)}")
        pre ++ shared ++ post
      }
      val fa = naive(doc("a"), 3, 4).map(_._2)
      val fb = naive(doc("b"), 3, 4).map(_._2)
      assert(fa.intersect(fb).nonEmpty, s"pair $i shares no fingerprint")
    }
  }

  test("density: selected count is near 2/(w+1) of the gram count") {
    val r = rnd(42)
    val toks = Seq.fill(5000)(s"t${r.nextInt(5000)}")
    val sel = naive(toks, 3, 4)
    val grams = toks.size - 2
    val frac = sel.size.toDouble / grams
    // expected 2/(w+1) = 0.4; allow wide slack (short-range correlations)
    assert(frac > 0.25 && frac < 0.55, s"density $frac")
  }

  test("selection applies to a stream unchanged (drained ≡ batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val r = rnd(55)
    val docs = Seq(
      (1L, Seq.fill(20)(s"a${r.nextInt(30)}").mkString(" ")),
      (2L, Seq.fill(9)(s"b${r.nextInt(30)}").mkString(" ")),
      (3L, "too short"), (4L, null: String))
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = TextOps.winnowOver(mem.toDS.toDF("doc_id", "text"), 3, 4)
      .writeStream.format("memory").queryName("winnow_stream")
      .outputMode("append").start()
    try { mem.addData(docs: _*); q.processAllAvailable() } finally q.stop()
    val got = spark.table("winnow_stream").collect().map(_.toString).toSet
    val batch = TextOps.winnowOver(docs.toDF("doc_id", "text"), 3, 4)
      .collect().map(_.toString).toSet
    assert(got.nonEmpty && got === batch)
  }

  test("overlap: shared-run pairs hit, df gate suppresses boilerplate fingerprints") {
    val r = rnd(99)
    val shared = Seq.fill(8)(s"sh${r.nextInt(1000)}")
    val boiler = Seq.fill(14)(s"bp${r.nextInt(1000)}")
    // docs 1,2 share a genuine 8-token run; docs 10..29 are IDENTICAL
    // template pages (the pure-boilerplate case), so every one of their
    // fingerprints is selected by all 20 copies — df 20 > maxDf 16, and
    // the gate must suppress every template pair
    val docs =
      Seq(1L -> (Seq.fill(5)(s"a${r.nextInt(100)}") ++ shared),
        2L -> (Seq.fill(5)(s"b${r.nextInt(100)}") ++ shared)) ++
        (10 until 30).map(i => i.toLong -> boiler)
    val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    // overlap is dir-based; route through the Over path via a temp view
    val tmp = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    df.write.parquet(s"$tmp/documents.parquet")
    val got = TextOps.winnowOverlap(spark, tmp).collect()
      .map(rr => (rr.getLong(0), rr.getLong(1))).toSet
    assert(got.contains((1L, 2L)), s"true pair missed: $got")
    // every boilerplate-only pair must be suppressed by the df gate
    assert(!got.exists { case (a, b) => a >= 10L && b >= 10L },
      s"boilerplate pair leaked: $got")
  }
}
