package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The fused winnow kernels (r16) must be VALUE-IDENTICAL to the
  * higher-order-function trees they replaced — the winnow oracle rows
  * (q_winnow / q_winnow_overlap / q_winnow_clusters / the match family)
  * replay those exact md5-gram values and selections in DuckDB, and the
  * maintained WinnowIndex artifact stores them, so any drift here is an
  * oracle break and a serving-artifact corruption, not a perf
  * regression.
  */
class WinnowKernelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  VectorFunctions.ensureRegistered(spark)

  // deterministic corpus with the nasty shapes: ties ("a a a ..."),
  // repeated grams, non-ASCII UTF-8 widths, single-window docs, and a
  // long pseudo-random doc
  private val rnd = new scala.util.Random(42)
  private val vocab = Vector("the", "a", "fox", "jumps", "über", "テスト",
    "zz", "q", "longtokenvalue", "7")
  private val docs = (Seq(
    (1L, Seq("a", "a", "a", "a", "a", "a", "a", "a")),
    (2L, Seq("the", "quick", "brown", "fox", "the", "quick", "brown", "fox")),
    (3L, Seq("единица", "テスト", "emojié", "x", "y", "z")),
    (4L, Seq("one", "two", "three", "four", "five", "six")),
    (5L, (0 until 300).map(_ => vocab(rnd.nextInt(vocab.size)))),
    (6L, Seq("exactly", "six", "tokens", "for", "one", "window"))) ++
    (7L to 20L).map(i =>
      (i, (0 until 20 + rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.size))))))
    .toDF("doc_id", "toks")

  test("md5_gram60 ≡ the conv(substring(md5(concat_ws))) transform tree") {
    for (k <- Seq(1, 2, 3, 5)) {
      val rows = docs.filter(size(col("toks")) >= k).select(col("doc_id"),
          VectorFunctions.md5Gram60(col("toks"), lit(k)).as("native"),
          graft.operators.TextOps.gramHash60Tree(col("toks"), k).as("tree"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"k=$k doc=${r.getLong(0)}"))
    }
  }

  test("xx_gram64 ≡ the xxhash64(concat_ws) transform tree") {
    for (k <- Seq(1, 3, 4)) {
      val rows = docs.filter(size(col("toks")) >= k).select(col("doc_id"),
          VectorFunctions.xxGram64(col("toks"), lit(k)).as("native"),
          graft.operators.TextOps.gramHashXxTree(col("toks"), k).as("tree"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getSeq[Any](1) == r.getSeq[Any](2),
        s"k=$k doc=${r.getLong(0)}"))
    }
  }

  test("gram kernels skip null tokens exactly like concat_ws") {
    val withNull = Seq((1L, Seq("a", null, "b", "c"))).toDF("doc_id", "toks")
    val r = withNull.select(
        VectorFunctions.md5Gram60(col("toks"), lit(3)).as("n60"),
        graft.operators.TextOps.gramHash60Tree(col("toks"), 3).as("t60"),
        VectorFunctions.xxGram64(col("toks"), lit(3)).as("n64"),
        graft.operators.TextOps.gramHashXxTree(col("toks"), 3).as("t64"))
      .collect().head
    assert(r.getSeq[Any](0) == r.getSeq[Any](1))
    assert(r.getSeq[Any](2) == r.getSeq[Any](3))
  }

  test("winnow_select ≡ array_distinct of the window-min when-chain tree") {
    for ((k, w) <- Seq((3, 4), (2, 2), (1, 5))) {
      val hs = VectorFunctions.md5Gram60(col("toks"), lit(k))
      val rows = docs.filter(size(col("toks")) >= k + w - 1)
        .select(col("doc_id"),
          VectorFunctions.winnowSelect(hs, lit(w)).as("native"),
          graft.operators.TextOps.winnowSelectTree(hs, w).as("tree"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        // field orders differ (kernel: (p, v); tree: (v, p)) — compare
        // the (p, v) pair sequences
        val native = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.get(1)))
        val tree = r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => (x.getInt(1).toLong, x.get(0)))
        assert(native == tree, s"k=$k w=$w doc=${r.getLong(0)}")
      }
    }
  }

  test("winnow_select honors least/when null semantics on null hashes") {
    val hs = Seq(
      (1L, Seq[java.lang.Long](5L, null, 3L, 9L, 3L, 7L)),
      (2L, Seq[java.lang.Long](null, null, null, null)),
      (3L, Seq[java.lang.Long](2L, 2L, 2L, 2L, 2L))).toDF("doc_id", "hs")
    val rows = hs.select(col("doc_id"),
        VectorFunctions.winnowSelect(col("hs"), lit(4)).as("native"),
        graft.operators.TextOps.winnowSelectTree(col("hs"), 4).as("tree"))
      .collect()
    rows.foreach { r =>
      val native = r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.get(1)))
      val tree = r.getSeq[org.apache.spark.sql.Row](2)
        .map(x => (java.lang.Long.valueOf(x.getInt(1).toLong), x.get(0)))
        .map { case (p, v) => (p.longValue(), v) }
      assert(native == tree, s"doc=${r.getLong(0)}")
    }
  }

  test("winnowOver end-to-end matches the declarative pipeline") {
    val corpus = docs.select(col("doc_id"),
      concat_ws(" ", col("toks")).as("text"))
    val (k, w) = (3, 4)
    val kernelRows = graft.operators.TextOps
      .winnowOver(corpus, k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tk = split(col("text"), " ")
    val treeRows = corpus
      .filter(col("text").isNotNull && size(tk) >= k + w - 1)
      .select(col("doc_id"), explode(graft.operators.TextOps
        .winnowSelectTree(
          graft.operators.TextOps.gramHash60Tree(tk, k), w)).as("s"))
      .select(col("doc_id"), col("s.p").cast("long"), col("s.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kernelRows == treeRows)
    assert(kernelRows.nonEmpty)
  }
}
