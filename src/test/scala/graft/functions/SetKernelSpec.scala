package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The fused sorted-set kernels (r17) must be VALUE-IDENTICAL to the
  * higher-order-function trees they replaced — the jaccard pair engine
  * (q_token_jaccard, q_ngram_jaccard, q_containment, q_dedup_clusters,
  * q_quality_survivor, q_incremental_dedup, q_hybrid_dedup) replays
  * those exact sets through the oracle-checked pair joins, so drift is
  * an oracle break, not a perf regression.
  */
class SetKernelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  VectorFunctions.ensureRegistered(spark)

  private def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** The replaced unigram tree, over a token-array column. */
  private def uniTree(toks: Column): Column =
    sort_array(array_distinct(transform(toks, x => xxhash64(x))))

  /** The replaced shingle tree (the [[graft.operators.TextOps.shingles]]
    * windowing), over a token-array column.
    */
  private def shingleTree(toks: Column, n: Int): Column =
    sort_array(bindOnce(transform(toks, t => xxhash64(t))) { th =>
      array_distinct(transform(
        sequence(lit(0), greatest(size(th) - n, lit(0))),
        i => xxhash64((0 until n).map(j => try_element_at(th, i + j + 1)): _*)))
    })

  private val rnd = new scala.util.Random(11)
  private val vocab = Vector("the", "the", "a", "fox", "über", "テスト", "zz",
    "", "longtokenvalue", "7", "x")
  private val docs = (Seq(
    (1L, Seq("a", "a", "a", "b", "b", "a")),
    (2L, Seq("solo")),
    (3L, Seq.empty[String]),
    (4L, Seq("единица", "テスト", "emojié", "テスト", "единица", "テスト")),
    (5L, (0 until 200).map(_ => vocab(rnd.nextInt(vocab.size))))) ++
    (6L to 20L).map(i =>
      (i, (0 until 3 + rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.size))))))
    .toDF("doc_id", "toks")
  private val withNull = Seq(
    (100L, Seq("a", null, "b", "c", "d")),
    (101L, Seq[String](null, null))).toDF("doc_id", "toks")

  test("hash_set_sorted ≡ sort_array(array_distinct(transform(toks, xxhash64)))") {
    val rows = docs.union(withNull).select(col("doc_id"),
        VectorFunctions.hashSetSorted(col("toks")).as("native"),
        uniTree(col("toks")).as("tree"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
      s"doc=${r.getLong(0)}"))
    // empty token array → empty set (the docHashSets size>0 gate's input)
    assert(rows.find(_.getLong(0) == 3L).get.getSeq[Long](1).isEmpty)
    // sets are sorted ascending and duplicate-free
    rows.foreach { r =>
      val s = r.getSeq[Long](1)
      assert(s == s.distinct.sorted, s"doc=${r.getLong(0)}")
    }
  }

  test("shingle_set_sorted ≡ sort_array(shingles tree), partial window included") {
    for (n <- Seq(2, 3, 7)) {
      val rows = docs.union(withNull).select(col("doc_id"),
          VectorFunctions.shingleSetSorted(col("toks"), lit(n)).as("native"),
          shingleTree(col("toks"), n).as("tree"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"n=$n doc=${r.getLong(0)}"))
      // the tree's empty-array edge: one all-null window = the bare seed
      assert(rows.find(_.getLong(0) == 3L).get.getSeq[Long](1) == Seq(42L),
        s"n=$n empty-array window")
    }
  }

  test("kernels ≡ the TextOps spec-oracle trees over split text") {
    val corpus = docs
      .select(col("doc_id"), concat_ws(" ", col("toks")).as("text"))
    val rows = corpus.select(col("doc_id"),
        VectorFunctions.hashSetSorted(split(col("text"), " ")).as("u_native"),
        graft.operators.TextOps.tokenHashSetTree(col("text")).as("u_tree"),
        VectorFunctions.shingleSetSorted(split(col("text"), " "), lit(3))
          .as("s_native"),
        graft.operators.TextOps.shingleHashSetTree(col("text"), 3).as("s_tree"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"uni doc=${r.getLong(0)}")
      assert(r.getSeq[Long](3) == r.getSeq[Long](4), s"shingle doc=${r.getLong(0)}")
    }
  }

  test("shingle_set_sorted rejects a non-positive width instead of looping") {
    val e = intercept[Exception] {
      docs.select(VectorFunctions.shingleSetSorted(col("toks"), lit(0))).collect()
    }
    assert(e.getMessage.contains("positive shingle width") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("positive shingle width"))
  }

  test("set_sketch: popcount(xor) <= |A △ B| — the gate can never " +
      "reject a pair the exact verification would keep") {
    // random long-hash sets of varied sizes, including near-duplicates
    // (small symmetric difference) and disjoint pairs
    val r = new scala.util.Random(7)
    val sets: Seq[Seq[Long]] = (0 until 40).map { i =>
      val base = (0 until 5 + r.nextInt(300)).map(_ => r.nextLong()).distinct
      if (i % 3 == 0 && base.size > 4)
        base.drop(1 + r.nextInt(3)) :+ r.nextLong() // near-dup of another draw shape
      else base
    }
    val df2 = sets.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "hs")
      .select(col("id"), col("hs"),
        VectorFunctions.setSketch(col("hs")).as("sk"))
    val rows = df2.collect().map(r2 =>
      (r2.getSeq[Long](1).toSet, r2.getSeq[Long](2)))
    for ((sa, ka) <- rows; (sb, kb) <- rows) {
      val xor = ka.zip(kb).map { case (x, y) =>
        java.lang.Long.bitCount(x ^ y) }.sum
      val symDiff = (sa diff sb).size + (sb diff sa).size
      assert(xor <= symDiff, s"popcount(xor)=$xor > |A△B|=$symDiff")
    }
    // and the Column-level popcount agrees VALUE-FOR-VALUE with the
    // local word-wise computation on every pair
    val byId = df2.collect().map(r2 => r2.getLong(0) -> r2.getSeq[Long](2)).toMap
    val x = df2.as("a").crossJoin(df2.as("b"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        VectorFunctions.sketchXorPopcnt(col("a.sk"), col("b.sk")).as("p"))
      .collect()
    assert(x.length == rows.length * rows.length)
    x.foreach { r2 =>
      val expect = byId(r2.getLong(0)).zip(byId(r2.getLong(1)))
        .map { case (u, v) => java.lang.Long.bitCount(u ^ v) }.sum
      assert(r2.getInt(2) == expect,
        s"pair (${r2.getLong(0)}, ${r2.getLong(1)}): " +
          s"column=${r2.getInt(2)} local=$expect")
    }
  }

  test("sketch_xor_popcnt rejects non-sketch-length arrays instead of " +
      "reading past an unsafe buffer") {
    val e = intercept[Exception] {
      Seq((1L, Seq(1L, 2L), Seq(3L))).toDF("id", "a", "b")
        .select(VectorFunctions.sketchXorPopcnt(col("a"), col("b")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("set_sketch")), msgs(e).mkString(" | "))
  }

  // NOTE: end-to-end gate-keeps-every-true-pair coverage lives in
  // JaccardPropertySpec (engine ≡ naive all-pairs on seeded corpora
  // dense with identical sets, near-misses and threshold-boundary
  // pairs) — the sketch gate sits inside the engine join it pins.
}
