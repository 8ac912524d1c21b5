package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The fused md5-tier kernels must be VALUE-IDENTICAL to the
  * higher-order-function trees they replaced — the minhash/simhash
  * oracle rows replay those exact values in DuckDB, so any drift here
  * is an oracle break, not a perf regression.
  */
class Md5SigSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  VectorFunctions.ensureRegistered(spark)

  /** The replaced expression form, kept verbatim as the reference. */
  private def h60(s: org.apache.spark.sql.Column) =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  private val docs = Seq(
    (1L, Seq("the", "quick", "brown", "fox", "the")),
    (2L, Seq("единица", "テスト", "emojié")), // non-ASCII UTF-8 widths
    (3L, Seq.empty[String]),
    (4L, Seq("solo"))).toDF("id", "elems")

  test("md5_min_sig ≡ the per-function array_min(transform(h60)) trees") {
    val k = 16
    val hof = array((0 until k).map(i =>
      array_min(transform(col("elems"), s => h60(concat(lit(s"$i|"), s))))): _*)
    val rows = docs.select(col("id"),
        VectorFunctions.md5MinSig(col("elems"), lit(k)).as("native"),
        hof.as("hof"))
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val n = r.getSeq[Any](1)
      val h = r.getSeq[Any](2)
      assert(n == h, s"id=${r.getLong(0)}")
      assert(n.length == k)
    }
    // the empty-element doc yields all-null entries (array_min of empty)
    val empty = rows.find(_.getLong(0) == 3L).get.getSeq[Any](1)
    assert(empty.forall(_ == null))
  }

  test("md5_h60_array ≡ transform(arr, h60); null elements map to null") {
    val withNull = Seq((1L, Seq("a", null, "b"))).toDF("id", "elems")
    val rows = docs.union(withNull).select(
        VectorFunctions.md5H60Array(col("elems")).as("native"),
        transform(col("elems"), s => h60(s)).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Any](0) == r.getSeq[Any](1)))
  }

  test("values match the documented h60 contract on a known string") {
    // independent recompute: first 15 hex chars of md5 as a base-16 int
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("7|token".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val got = Seq(Seq("token")).toDF("elems")
      .select(VectorFunctions.md5MinSig(col("elems"), lit(8)))
      .collect().head.getSeq[Any](0)(7)
    assert(got == expected)
  }

  test("xx_min_sig ≡ the per-function array_min(transform(xxhash64)) trees") {
    val k = 16
    val ths = Seq(
      (1L, Seq[Option[Long]](Some(42L), Some(-7L), Some(Long.MaxValue))),
      (2L, Seq[Option[Long]]()), // empty → k nulls
      (3L, Seq[Option[Long]](Some(5L), None)), // null elem → seed value
      (4L, Seq[Option[Long]](Some(0L))))
      .toDF("id", "ths")
    val hof = array((0 until k).map(i =>
      array_min(transform(col("ths"), x => xxhash64(lit(i), x)))): _*)
    val rows = ths.select(col("id"),
        VectorFunctions.xxMinSig(col("ths"), lit(k)).as("native"),
        hof.as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"id=${r.getLong(0)}")
    }
    assert(rows.find(_.getLong(0) == 2L).get.getSeq[Any](1).forall(_ == null))
    // the ONE documented divergence from the replaced tree: a null ARRAY
    // null-propagates (the tree produced [null x k]); callers filter
    // size(ths) > 0, which drops null arrays before the expression
    val nullArr = Seq((9L, null: Seq[Option[Long]])).toDF("id", "ths")
      .select(VectorFunctions.xxMinSig(col("ths"), lit(k)))
      .collect()
    assert(nullArr.head.isNullAt(0))
  }

  test("vec_eq_count ≡ the zip_with equal-vote fold (null votes 0)") {
    val pairs = Seq(
      (Seq[Option[Long]](Some(1L), Some(2L), Some(3L), Some(4L)),
        Seq[Option[Long]](Some(1L), Some(9L), Some(3L), Some(4L))), // 3 agree
      (Seq[Option[Long]](Some(1L), Some(2L)),
        Seq[Option[Long]](Some(1L), Some(2L))), // all agree
      (Seq[Option[Long]](Some(1L), None, Some(3L)),
        Seq[Option[Long]](Some(1L), Some(2L), Some(3L)))) // null votes 0
      .toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) =>
      when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v).cast("long")
    val rows = pairs.select(
        VectorFunctions.eqCountLong(col("a"), col("b")).as("native"),
        hof.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 2L, 2L))
  }

  test("stays inside whole-stage codegen over a real scan") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = d.select(VectorFunctions.md5MinSig(
      split(col("text"), " "), lit(16)).as("sig"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[md5_min_sig.*"), plan)
    assert(q.count() > 0)
  }
}
