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

  // ---- fused merge + pair-count deltas ---------------------------------

  private def deltaRun(toks: Seq[String], l: String, r: String)
      : (Seq[String], Map[(String, String), Long]) = {
    val row = Seq(Tuple1(toks)).toDF("t")
      .select(VectorFunctions.bpeMergeDelta(col("t"), lit(l), lit(r)).as("s"))
      .select(col("s.toks"), col("s.deltas")).collect().head
    val out = row.getSeq[String](0)
    val ds = row.getSeq[org.apache.spark.sql.Row](1)
      .groupBy(d => (d.getString(0), d.getString(1)))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
      .filter(_._2 != 0L)
    (out, ds)
  }

  private def pairCounts(toks: Seq[String]): Map[(String, String), Long] =
    toks.sliding(2).filter(_.size == 2).map(p => (p(0), p(1)))
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def checkDelta(toks: Seq[String], l: String, r: String): Unit = {
    val (out, ds) = deltaRun(toks, l, r)
    assert(out == step(toks, l, r), s"toks=$toks rule=($l,$r)")
    val want = (pairCounts(out).keySet ++ pairCounts(toks).keySet).flatMap { p =>
      val dn = pairCounts(out).getOrElse(p, 0L) - pairCounts(toks).getOrElse(p, 0L)
      if (dn != 0L) Some(p -> dn) else None
    }.toMap
    assert(ds == want, s"toks=$toks rule=($l,$r): got $ds want $want")
  }

  test("delta algebra: aggregated deltas equal recount(new) - recount(old)") {
    checkDelta(Seq("a", "a", "a"), "a", "a")
    checkDelta(Seq("a", "a", "a", "a"), "a", "a")
    checkDelta(Seq("a", "b", "a", "b"), "a", "b") // boundary pair cancels
    checkDelta(Seq("x", "a", "b", "y", "a", "b"), "a", "b")
    checkDelta(Seq("a", "b"), "a", "b") // no neighbors at all
    checkDelta(Seq("a", "b", "a"), "x", "y") // no sites → no deltas
  }

  test("delta algebra on randomized runs-heavy arrays") {
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "c")
    for (_ <- 1 to 40) {
      val toks = Vector.fill(2 + rnd.nextInt(14))(alphabet(rnd.nextInt(3)))
      val l = alphabet(rnd.nextInt(3)); val r = alphabet(rnd.nextInt(3))
      checkDelta(toks, l, r)
    }
  }

  // ---- batched (chained) application ------------------------------------

  /** Run a rule CHAIN through the one-projection batched applier and
    * return (merged toks, aggregated deltas).
    */
  private def chainRun(toks: Seq[String], rules: Seq[(String, String)])
      : (Seq[String], Map[(String, String), Long]) = {
    val row = Seq(Tuple1(toks)).toDF("t")
      .select(graft.operators.TextOps
        .applyRulesWithDeltas(col("t"), rules).as("s"))
      .select(col("s.toks"), col("s.deltas")).collect().head
    val out = row.getSeq[String](0)
    val ds = row.getSeq[org.apache.spark.sql.Row](1)
      .groupBy(d => (d.getString(0), d.getString(1)))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
      .filter(_._2 != 0L)
    (out, ds)
  }

  test("chained application: one projection equals sequential applies; deltas equal recount diff") {
    val rnd = new scala.util.Random(11)
    val alphabet = Vector("a", "b", "c", "d", "e", "f")
    for (_ <- 1 to 30) {
      val toks = Vector.fill(2 + rnd.nextInt(16))(alphabet(rnd.nextInt(6)))
      // 2-3 arbitrary rules — the chain contract (sequential semantics,
      // concatenated deltas) must hold even for NON-disjoint rules; the
      // trainer's disjointness filter is a selection policy on top
      val rules = (0 until (2 + rnd.nextInt(2))).map { _ =>
        (alphabet(rnd.nextInt(6)), alphabet(rnd.nextInt(6)))
      }
      val (out, ds) = chainRun(toks, rules)
      val want = rules.foldLeft(toks: Seq[String])((cur, rl) => step(cur, rl._1, rl._2))
      assert(out == want, s"toks=$toks rules=$rules")
      val wantDs = (pairCounts(want).keySet ++ pairCounts(toks).keySet)
        .flatMap { p =>
          val dn = pairCounts(want).getOrElse(p, 0L) -
            pairCounts(toks).getOrElse(p, 0L)
          if (dn != 0L) Some(p -> dn) else None
        }.toMap
      assert(ds == wantDs, s"toks=$toks rules=$rules: got $ds want $wantDs")
    }
  }

  test("chained application with an empty rule list is the identity with no deltas") {
    val (out, ds) = chainRun(Seq("a", "b", "a"), Seq.empty)
    assert(out == Seq("a", "b", "a") && ds.isEmpty)
  }
}
