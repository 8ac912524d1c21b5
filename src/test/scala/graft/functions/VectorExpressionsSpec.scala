package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Native DotProduct expression: value parity with the composable HOF
  * formulation, codegen path, SQL registration, null/type handling.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._
  VectorFunctions.ensureRegistered(spark)

  private val df = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.5f, -1.5f, 2.25f), Array(2.0f, 0.0f, -4.0f)))
    .toDF("id", "a", "b")

  test("bit-identical to aggregate(zip_with(...)) fold") {
    val hof = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val rows = df.select(VectorFunctions.dot(col("a"), col("b")).as("native"),
      hof.as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows.head.getDouble(0) == 32.0) // 4 + 10 + 18
  }

  test("usable from SQL once registered") {
    df.createOrReplaceTempView("vecs")
    val out = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs WHERE id = 1")
      .as[Double].collect()
    assert(out.toSeq == Seq(32.0))
  }

  test("double arrays and mixed widths work") {
    val d = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("x", "y")
      .select(VectorFunctions.dot(col("x"), col("y"))).as[Double].collect()
    assert(d.head == 11.0)
  }

  test("null input → null out (BinaryExpression null semantics)") {
    val n = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("x", "y")
      .select(VectorFunctions.dot(col("x"), col("y"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("non-array argument is an analysis error, not a runtime crash") {
    val ex = intercept[Exception] {
      df.select(VectorFunctions.dot(col("id"), col("a"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("vec_dot") ||
      ex.getMessage.toLowerCase.contains("datatype_mismatch") ||
      ex.getMessage.toLowerCase.contains("array"))
  }

  test("runs inside whole-stage codegen (no interpreted fallback)") {
    // local Seq relations are folded by ConvertToLocalRelation (no codegen
    // at all), so observe the plan over a real parquet scan
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.select(VectorFunctions.dot(col("embedding"), col("embedding")).as("d"))
    // `*(n)` marks a WholeStageCodegen stage in the compact plan rendering
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[vec_dot.*"), plan)
    assert(q.agg(max(col("d"))).collect().head.getDouble(0) > 0.0)
  }

  test("quantize_e7: bit-identical to the transform(cast·1e7·cast) form, codegen") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val native = emb.orderBy("vec_id")
      .select(VectorFunctions.quantizeE7(col("embedding")).as("q"))
      .collect().map(_.getSeq[Long](0))
    val hof = emb.orderBy("vec_id")
      .select(transform(col("embedding"),
        x => (x.cast("double") * lit(1.0e7)).cast("long")).as("q"))
      .collect().map(_.getSeq[Long](0))
    assert(native.length == hof.length && native.nonEmpty)
    native.zip(hof).foreach { case (a, b) => assert(a == b) }
    // and it stays inside whole-stage codegen (the point of existing)
    val plan = emb.select(VectorFunctions.quantizeE7(col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[quantize_e7.*"), plan)
  }

  test("sig_codes_long: strict-positive sign bits, (t, j, i)-major layout") {
    // 2 tables × 2 bits × dim 2: t0j0=[1,0] t0j1=[-1,0] t1j0=[0,1] t1j1=[1,-1]
    val flat: Seq[Long] = Seq(1L, 0L, -1L, 0L, 0L, 1L, 1L, -1L)
    val rows = Seq((1L, Seq(5L, 3L)), (2L, Seq(0L, 0L)), (3L, Seq(-2L, 4L)))
      .toDF("id", "xq")
    val got = rows.select(col("id"),
        VectorFunctions.sigCodesLong(col("xq"), typedlit(flat), lit(2)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // row 1: t0 projs (5, -5) → code 1; t1 projs (3, 2) → code 3
    assert(got(1L) == Seq(1, 3))
    // zero projections are NOT positive — no bits set
    assert(got(2L) == Seq(0, 0))
    // row 3: t0 projs (-2, 2) → code 2; t1 projs (4, -6) → code 1
    assert(got(3L) == Seq(2, 1))
  }

  test("pq_codes_long: argmin per subspace, lowest-cid ties, codegen") {
    // 2 subspaces × 3 codes × 2 dims, flattened (s, c, i)-major.
    // subspace 0: row [10, 0] — exact tie between codes 1 and 2
    //   (both at distance 0 from [10, 0]) → lowest cid (1) must win;
    // subspace 1: row [7, 7] — nearest is code 0 ([8, 8], d=2).
    val flat: Seq[Long] = Seq(
      0L, 0L, /*s0c0*/ 10L, 0L, /*s0c1*/ 10L, 0L, /*s0c2*/
      8L, 8L, /*s1c0*/ 0L, 0L, /*s1c1*/ -8L, -8L /*s1c2*/)
    val rows = Seq((1L, Seq(10L, 0L, 7L, 7L)), (2L, Seq(0L, 1L, -6L, -7L)))
      .toDF("id", "xq")
    val got = rows.select(col("id"),
        VectorFunctions.pqCodesLong(col("xq"), typedlit(flat), lit(2)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(1, 0)) // tie → cid 1, not 2
    assert(got(2L) == Seq(0, 2))
    // null row → null out
    val n = Seq((3L, null: Seq[Long])).toDF("id", "xq")
      .select(VectorFunctions.pqCodesLong(col("xq"), typedlit(flat), lit(2)))
      .collect()
    assert(n.head.isNullAt(0))
    // stays inside whole-stage codegen over a real scan (the array is
    // built from codegen-able longs — a transform(...) lambda is a
    // CodegenFallback and would drop the whole Project out regardless
    // of this expression)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb
      .select(array((0 until 4).map(i => col("vec_id") + i): _*).as("xq"))
      .select(VectorFunctions.pqCodesLong(col("xq"),
        typedlit((0 until 8).map(_.toLong)), lit(2)).as("c"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[pq_codes_long.*"), plan)
    assert(q.count() > 0)
  }

  test("range_shard: bit-identical to the fold-of-whens form it replaced, " +
      "duplicates and extremes included, inside codegen") {
    import org.apache.spark.sql.Column
    // the replaced expression form, kept verbatim for the identity pin
    def foldForm(fp: Column, bounds: Seq[Long]): Column =
      bounds.foldLeft(lit(0))((acc, b) =>
        acc + when(fp >= lit(b), 1).otherwise(0)).cast("int")
    val bounds = Seq(Long.MinValue + 1, -50L, -50L, 0L, 3L, 900L, 900L,
      Long.MaxValue - 1).sorted
    val fps = Seq(Long.MinValue, Long.MinValue + 1, -51L, -50L, -1L, 0L,
      2L, 3L, 4L, 899L, 900L, 901L, Long.MaxValue - 1, Long.MaxValue)
    val df = fps.map(Tuple1(_)).toDF("fp")
    val got = df.select(col("fp"),
        VectorFunctions.rangeShard(col("fp"), typedlit(bounds)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = df.select(col("fp"), foldForm(col("fp"), bounds).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === want)
    // and the linear-class reference: count of bounds <= fp
    fps.foreach { fp =>
      assert(got(fp) == bounds.count(_ <= fp), s"fp=$fp")
    }
    // a PRODUCTION-width cut (4095 bounds = 4096 shards): the fold form
    // this kernel replaced overflowed Catalyst recursion at this width
    val wide = (0 until 4095).map(i => i.toLong * 1000).sorted
    val wideGot = df.select(
        VectorFunctions.rangeShard(col("fp"), typedlit(wide)).as("s"))
      .collect().map(_.getInt(0))
    assert(wideGot.toSeq == fps.map(fp => wide.count(_ <= fp)))
    // stays inside whole-stage codegen over a real scan (a local
    // relation constant-folds to LocalTableScan and shows no codegen)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.select(VectorFunctions.rangeShard(col("vec_id"),
      typedlit(bounds)).as("s"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[range_shard.*"), plan)
    assert(q.count() > 0)
  }

  test("shape mismatches refuse loudly — never codes at silently wrong offsets") {
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    def failsWith(msg: String)(body: => Unit): Unit = {
      val e = intercept[Exception](body)
      assert(chain(e).exists(_.contains(msg)), chain(e).mkString(" | "))
    }
    // pq_codes_long: dim 3 not divisible by subs=2
    failsWith("not divisible by") {
      Seq((1L, Seq(1L, 2L, 3L))).toDF("id", "xq")
        .select(VectorFunctions.pqCodesLong(col("xq"),
          typedlit(Seq(0L, 0L, 0L)), lit(2)))
        .collect(): Unit
    }
    // pq_codes_long: codebook fit at another dim (|flat| % dim != 0)
    failsWith("not a multiple of") {
      Seq((1L, Seq(1L, 2L))).toDF("id", "xq")
        .select(VectorFunctions.pqCodesLong(col("xq"),
          typedlit(Seq(0L, 0L, 0L)), lit(2)))
        .collect(): Unit
    }
    // sig_codes_long: plane table derived at another dim
    failsWith("not a multiple of") {
      Seq((1L, Seq(1L, 2L))).toDF("id", "xq")
        .select(VectorFunctions.sigCodesLong(col("xq"),
          typedlit(Seq(0L, 0L, 0L)), lit(2)))
        .collect(): Unit
    }
  }
}
