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

  test("bpe_toks ≡ filter(split(text, ' ', -1), t != '') — edges, runs, unicode") {
    val corpus = docs.select(col("doc_id"), concat_ws(" ", col("toks")).as("text"))
      .union(Seq(
        (200L, "  leading and   runs  "),
        (201L, ""),
        (202L, "   "),
        (203L, "単語 テスト  x"),
        (204L, "one")).toDF("doc_id", "text"))
    val rows = corpus.select(col("doc_id"),
        VectorFunctions.bpeToks(col("text")).as("native"),
        graft.operators.TextOps.bpeToksTree(col("text")).as("tree"))
      .collect()
    rows.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
      s"doc=${r.getLong(0)}"))
    assert(rows.find(_.getLong(0) == 201L).get.getSeq[String](1).isEmpty)
    assert(rows.find(_.getLong(0) == 200L).get.getSeq[String](1) ==
      Seq("leading", "and", "runs"))
  }

  test("gram_strings_full ≡ the decontamination full-window gram tree") {
    val corpus = docs.union(withNull)
      .select(col("doc_id"), concat_ws(" ", col("toks")).as("text"))
    for (n <- Seq(2, 3, 7)) {
      val rows = corpus.select(col("doc_id"),
          VectorFunctions.gramStringsFull(split(col("text"), " "), lit(n))
            .as("native"),
          graft.operators.TextOps.gramStringsFullTree(n).as("tree"))
        .collect()
      rows.foreach(r => assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"n=$n doc=${r.getLong(0)}"))
    }
  }

  test("rag_chunks_arr ≡ the slice/concat_ws chunk tree, gapped stride included") {
    for ((w, s) <- Seq((64, 48), (8, 8), (4, 6), (3, 1))) {
      val rows = docs.union(withNull).select(col("doc_id"),
          VectorFunctions.ragChunksArr(col("toks"), lit(w), lit(s)).as("native"),
          graft.operators.TextOps.ragChunksTree(col("toks"), w, s).as("tree"))
        .collect()
      rows.foreach { r =>
        val native = r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getInt(0), x.getInt(1), x.getString(2)))
        val tree = r.getSeq[org.apache.spark.sql.Row](2)
          .map(x => (x.getInt(0), x.getInt(1), x.getString(2)))
        assert(native == tree, s"w=$w s=$s doc=${r.getLong(0)}")
      }
    }
  }

  test("scrub_keep ≡ the kept-token filter + array_join rebuild tree") {
    val spans = Seq(
      (1L, Seq((2, 3))),
      (2L, Seq.empty[(Int, Int)]),
      (4L, Seq((1, 2), (5, 6))),
      (5L, Seq((10, 50), (100, 120), (151, 300))),
      (100L, Seq((2, 2), (4, 5)))).toDF("doc_id", "raw")
      .select(col("doc_id"), transform(col("raw"),
        r => struct(r.getField("_1").as("s"), r.getField("_2").as("e"))).as("spans"))
    val rows = docs.union(withNull)
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        VectorFunctions.scrubKeep(col("toks"),
          coalesce(col("spans"), array().cast("array<struct<s:int,e:int>>")))
          .as("native"),
        graft.operators.TextOps.scrubKeepTree(col("toks"),
          coalesce(col("spans"), array().cast("array<struct<s:int,e:int>>")))
          .as("tree"))
      .collect()
    rows.foreach { r =>
      val native = (r.getStruct(1).getInt(0), r.getStruct(1).getString(1))
      val tree = (r.getStruct(2).getInt(0), r.getStruct(2).getString(1))
      assert(native == tree, s"doc=${r.getLong(0)}")
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
