package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The fused text kernels (r16) must be VALUE-IDENTICAL to the
  * higher-order-function trees they replaced — oracle rows
  * (q_repetition, q_top_ngrams, the span/chunk families, the quality
  * gates) replay those exact values in DuckDB, so drift is an oracle
  * break, not a perf regression.
  */
class TextKernelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  VectorFunctions.ensureRegistered(spark)

  private def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  private val rnd = new scala.util.Random(7)
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

  test("tok_len_sum ≡ aggregate(toks, 0L, acc + length(t)); null-propagating") {
    val rows = docs.union(withNull).select(col("doc_id"),
        VectorFunctions.tokLenSum(col("toks")).as("native"),
        aggregate(col("toks"), lit(0L), (a, t) => a + length(t)).as("tree"))
      .collect()
    rows.foreach(r => assert(r.get(1) == r.get(2), s"doc=${r.getLong(0)}"))
    // chars, not bytes, and a null token nulls the sum
    assert(rows.find(_.getLong(0) == 4L).get.getLong(1) == 29L)
    assert(rows.find(_.getLong(0) == 100L).get.isNullAt(1))
  }

  test("mode_count ≡ the array_sort + longest-run fold") {
    val rows = docs.union(withNull).select(col("doc_id"),
        VectorFunctions.modeCount(col("toks")).as("native"),
        graft.operators.TextOps.modeCountTree(col("toks")).as("tree"))
      .collect()
    rows.foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"doc=${r.getLong(0)}"))
    assert(rows.find(_.getLong(0) == 1L).get.getLong(1) == 4L)
    assert(rows.find(_.getLong(0) == 3L).get.getLong(1) == 0L)
  }

  test("bigram_mode_count ≡ modeCountTree over the concat bigram tree") {
    def bigramsTree(t0: Column): Column = bindOnce(t0) { t =>
      when(size(t) >= 2,
        transform(sequence(lit(0), size(t) - 2),
          i => concat(element_at(t, i + 1), lit(" "), element_at(t, i + 2))))
        .otherwise(array().cast("array<string>"))
    }
    val rows = docs.union(withNull).select(col("doc_id"),
        VectorFunctions.bigramModeCount(col("toks")).as("native"),
        graft.operators.TextOps.modeCountTree(bigramsTree(col("toks"))).as("tree"))
      .collect()
    rows.foreach(r =>
      assert(r.getLong(1) == r.getLong(2), s"doc=${r.getLong(0)}"))
  }

  test("window_keys2 ≡ the two-lane xxhash64 window tree") {
    for (w <- Seq(2, 8)) {
      val rows = docs.union(withNull).filter(size(col("toks")) >= w)
        .select(col("doc_id"),
          VectorFunctions.windowKeys2(col("toks"), lit(w)).as("native"),
          graft.operators.TextOps.windowKeysTree(col("toks"), w).as("tree"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val native = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1)))
        val tree = r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => (x.getLong(0), x.getLong(1)))
        assert(native == tree, s"w=$w doc=${r.getLong(0)}")
      }
    }
  }

  test("chunk_keys2 ≡ the two-salt fold tree, distinct included") {
    // the declarative tree's sequence(1, size, n) errors on an EMPTY
    // array — an input the callers never produce (split() yields at
    // least one element); the kernel returns empty instead
    for (n <- Seq(3, 16)) {
      val rows = docs.union(withNull).filter(size(col("toks")) >= 1)
        .select(col("doc_id"),
          VectorFunctions.chunkKeys2(col("toks"), lit(n)).as("native"),
          graft.operators.TextOps.chunkKeysTree(col("toks"), n).as("tree"))
        .collect()
      rows.foreach { r =>
        val native = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getLong(1)))
        val tree = r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => (x.getLong(0), x.getLong(1)))
        assert(native == tree, s"n=$n doc=${r.getLong(0)}")
      }
    }
  }

  test("gram_strings ≡ the in-order concat_ws transform tree") {
    for (n <- Seq(2, 5)) {
      val tree = transform(
        sequence(lit(1), size(col("toks")) - (n - 1)),
        i => concat_ws(" ",
          (0 until n).map(j => try_element_at(col("toks"), i + j)): _*))
      val rows = docs.union(withNull).filter(size(col("toks")) >= n)
        .select(col("doc_id"),
          VectorFunctions.gramStrings(col("toks"), lit(n)).as("native"),
          tree.as("tree"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"n=$n doc=${r.getLong(0)}"))
    }
  }

  test("gram_strings_distinct ≡ the minhash partial-window tree") {
    val corpus = docs.union(withNull)
      .select(col("doc_id"), concat_ws(" ", col("toks")).as("text"))
    for (n <- Seq(2, 3, 7)) {
      val rows = corpus.select(col("doc_id"),
          VectorFunctions.gramStringsDistinct(split(col("text"), " "), lit(n))
            .as("native"),
          graft.operators.TextOps.gramStringsTree(col("text"), n).as("tree"))
        .collect()
      rows.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"n=$n doc=${r.getLong(0)}"))
    }
  }
}
