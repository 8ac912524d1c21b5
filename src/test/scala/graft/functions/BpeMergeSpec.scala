package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Native BPE merge-step expression: greedy left-to-right non-overlapping
  * replacement semantics (the part a naive `regexp_replace` chain gets
  * wrong on runs), null handling, SQL registration.
  */
class BpeMergeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  VectorFunctions.ensureRegistered(spark)

  private def step(toks: Seq[String], l: String, r: String): Seq[String] =
    Seq(Tuple1(toks)).toDF("t")
      .select(VectorFunctions.bpeMergeStep(col("t"), lit(l), lit(r)).as("m"))
      .as[Seq[String]].collect().head

  test("greedy LTR on runs: survivor does not re-merge with merged symbol") {
    assert(step(Seq("a", "a", "a"), "a", "a") == Seq("a a", "a"))
    assert(step(Seq("a", "a", "a", "a"), "a", "a") == Seq("a a", "a a"))
    assert(step(Seq("a", "a", "a", "a", "a"), "a", "a") == Seq("a a", "a a", "a"))
  }

  test("non-adjacent and partial matches pass through") {
    assert(step(Seq("a", "b", "a"), "a", "a") == Seq("a", "b", "a"))
    assert(step(Seq("x", "a", "b", "y", "a", "b"), "a", "b") ==
      Seq("x", "a b", "y", "a b"))
    assert(step(Seq.empty[String], "a", "b") == Seq.empty[String])
    assert(step(Seq("a"), "a", "b") == Seq("a"))
  }

  test("merged symbols are atomic: 'a b' != token 'ab', and can re-merge") {
    // round 2 of a real trainer: the merged symbol is a first-class token
    assert(step(Seq("a b", "c", "a b"), "a", "b") == Seq("a b", "c", "a b"))
    assert(step(Seq("a b", "a b"), "a b", "a b") == Seq("a b a b"))
    assert(step(Seq("ab", "b"), "a", "b") == Seq("ab", "b"))
  }

  test("empty-string tokens are ordinary symbols") {
    assert(step(Seq("", "", "x"), "", "") == Seq(" ", "x"))
    assert(step(Seq("a", "", "b"), "a", "") == Seq("a ", "b"))
  }

  test("null elements never match and pass through unchanged") {
    val out = Seq(Tuple1(Seq[String]("a", null, "a", "a")))
      .toDF("t")
      .select(VectorFunctions.bpeMergeStep(col("t"), lit("a"), lit("a")).as("m"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("a", null, "a a"))
  }

  test("null array in → null out") {
    val out = Seq(Tuple1(Option.empty[Seq[String]])).toDF("t")
      .select(VectorFunctions.bpeMergeStep(col("t"), lit("a"), lit("b")))
      .collect().head
    assert(out.isNullAt(0))
  }

  test("usable from SQL once registered") {
    val out = spark.sql(
      "SELECT bpe_merge_step(array('a','b','a','b'), 'a', 'b') AS m")
      .as[Seq[String]].collect().head
    assert(out == Seq("a b", "a b"))
  }
}
